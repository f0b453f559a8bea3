#!/usr/bin/env python
"""Sweep `batch_windows` (exact-mode window packing) on the real chip.

Window packing concatenates B consecutive 6-frame windows into ONE device
program with the FGATS blend masked at window boundaries (pair_mask), so the
output is bit-equal to running the windows separately — pure MXU batching.
This sweep finds the best exact-mode operating point for bench.py.

Run: VFACE_PLATFORM= python scripts/bench_window_packing.py   (axon = real chip)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

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
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    results = {}
    for bw in (1, 2, 4):
        opts = SwapOptions(batch_windows=bw)
        pipe = VideoSwapPipeline(model, opts)
        f = opts.window * bw
        s = opts.image_size
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
        pair_mask = None
        if bw > 1:
            import numpy as np

            m = np.ones((f - 1,), np.float32)
            for b0 in range(opts.window, f, opts.window):
                m[b0 - 1] = 0.0
            pair_mask = jnp.asarray(m)

        def run():
            out = pipe.swap_window(
                params, crops, keep, cond, uncond, inv_c, c_src, src, src_keep,
                flow, pair_mask=pair_mask,
            )
            return float(jax.device_get(jnp.mean(out)))

        t0 = time.perf_counter()
        run()  # compile + warmup
        print(f"bw={bw}: compile+warmup {time.perf_counter()-t0:.1f}s", flush=True)
        n_rep = 2
        t0 = time.perf_counter()
        for _ in range(n_rep):
            run()
        dt = (time.perf_counter() - t0) / n_rep
        fps = f / dt
        results[bw] = {"s_per_program": round(dt, 3), "frames_per_s": round(fps, 4)}
        print(json.dumps({"batch_windows": bw, **results[bw]}), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
