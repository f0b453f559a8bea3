#!/usr/bin/env python
"""Numeric deviation bound + speedup for the encoder-propagation approx mode.

`encoder_interval > 1` reuses cached (post-fusion) input-block skips and the
middle activation on non-key steps ("Faster Diffusion", PAPERS.md), with the
denser-early key schedule. It is an approximation; VERDICT requires any
approx-mode benchmark number to ship with a parity bound. Real-weight FID is
not possible in this environment, so this measures the approximation operator
itself at the real operating point (512², 6-frame window, 50+50 steps,
random weights): per-pixel deviation of the decoded window output vs exact,
plus the measured wall-clock ratio.

Run: VFACE_PLATFORM= python scripts/bench_approx_bound.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def main():
    from vface_tpu.models import ModelConfig, VFaceModel
    from vface_tpu.pipelines.video_swap import SwapOptions, VideoSwapPipeline

    model = VFaceModel(ModelConfig.sd_v1_inpaint())
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    f, s = 6, 512
    d = model.cfg.unet.context_dim
    crops = jax.random.normal(jax.random.PRNGKey(1), (f, s, s, 3)) * 0.2
    keep = jnp.ones((f, s, s, 1))
    cond = jax.random.normal(jax.random.PRNGKey(2), (f, 1, d))
    uncond = jax.random.normal(jax.random.PRNGKey(3), (f, 1, d))
    inv_c = jax.random.normal(jax.random.PRNGKey(4), (f, 1, d))
    c_src = jax.random.normal(jax.random.PRNGKey(5), (f, 1, d))
    src = jax.random.normal(jax.random.PRNGKey(6), (1, s, s, 3)) * 0.2
    src_keep = jnp.ones((1, s, s, 1))
    flow = jax.random.normal(jax.random.PRNGKey(7), (f - 1, s, s, 2))
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    results = {}
    ref = None
    for interval in (1, 2, 3):
        pipe = VideoSwapPipeline(model, SwapOptions(encoder_interval=interval))
        def run():
            out = pipe.swap_window(
                params, crops, keep, cond, uncond, inv_c, c_src, src, src_keep, flow
            )
            return out
        out = run()
        _ = float(jax.device_get(jnp.mean(out)))  # compile+warm
        t0 = time.perf_counter()
        for _ in range(2):
            _ = float(jax.device_get(jnp.mean(run())))
        dt = (time.perf_counter() - t0) / 2
        out_np = np.asarray(jax.device_get(out))
        row = {"s_per_window": round(dt, 3), "frames_per_s": round(f / dt, 4)}
        if interval == 1:
            ref = out_np
        else:
            diff = np.abs(out_np - ref)
            mse = float(np.mean((out_np - ref) ** 2))
            row.update({
                "max_abs_dev_01": round(float(diff.max()), 4),
                "mean_abs_dev_01": round(float(diff.mean()), 5),
                "psnr_db_vs_exact": round(float(10 * np.log10(1.0 / max(mse, 1e-12))), 2),
            })
        results[f"encoder_interval={interval}"] = row
        print(json.dumps({f"encoder_interval={interval}": row}), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
