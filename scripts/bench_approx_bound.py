#!/usr/bin/env python
"""Numeric deviation bound + speedup for the encoder-propagation approx mode.

`encoder_interval > 1` reuses cached (post-fusion) input-block skips and the
middle activation on non-key steps ("Faster Diffusion", PAPERS.md), with the
denser-early key schedule. It is an approximation; VERDICT requires any
approx-mode benchmark number to ship with a parity bound. Real-weight FID is
not possible in this environment, so this measures the approximation operator
itself at the real operating point (512², 6-frame window, 50+50 steps,
random weights): deviation of the sampled window latents z0 vs exact
(measured pre-decode — a random-init VAE decoder saturates the [0,1] clip,
which would mask any eps-path difference), plus the measured wall-clock
ratio of the full window.

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
    # the UNet out_conv is zero-initialised (eps ≡ 0 → a vacuous,
    # cache-independent trajectory); perturb every param so the deviation
    # measurement actually exercises the eps path. Keys are folded per leaf
    # path so perturbations are independent across leaves (identical keys
    # would correlate every leaf's draw and measure an atypical network).
    import zlib

    def _perturb(path, x):
        if not jnp.issubdtype(x.dtype, jnp.floating):
            return x
        key = jax.random.fold_in(
            jax.random.PRNGKey(42), zlib.crc32(jax.tree_util.keystr(path).encode())
        )
        return x + 0.02 * jax.random.normal(key, x.shape, x.dtype)

    params = jax.jit(
        lambda p: jax.tree_util.tree_map_with_path(_perturb, p)
    )(params)
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

    from vface_tpu.samplers.inversion import ddim_invert
    from vface_tpu.samplers.vface import vface_sample
    from vface_tpu.ops.warp import resize_flow

    hl = model.cfg.latent_size
    z = jax.random.normal(jax.random.PRNGKey(9), (f, hl, hl, 4))
    mask_lat = jnp.ones((f, hl, hl, 1))
    flow_q = resize_flow(flow, hl, hl)

    results = {}
    ref = None
    ref_rms = None
    for interval in (1, 2, 3):
        pipe = VideoSwapPipeline(model, SwapOptions(encoder_interval=interval))

        def z0_fn(p, z_, c_):
            _, il = ddim_invert(model, p, z_, c_, z_, mask_lat,
                                num_steps=50, keep=f, skip_last=1,
                                encoder_interval=interval)
            return vface_sample(
                model, p, il[-1], cond, uncond, c_, il, z_, mask_lat,
                pipe.injection, flow=flow_q, num_steps=50, cfg_scale=3.0,
                drop_recon_chunk=True, encoder_interval=interval,
            )[0]

        z0_jit = jax.jit(z0_fn)
        z0 = z0_jit(params, z, inv_c)
        _ = float(jax.device_get(jnp.mean(z0)))  # compile+warm
        t0 = time.perf_counter()
        for _ in range(2):
            _ = float(jax.device_get(jnp.mean(z0_jit(params, z, inv_c))))
        dt = (time.perf_counter() - t0) / 2
        z0_np = np.asarray(jax.device_get(z0))
        row = {"s_inv+samp": round(dt, 3)}
        if interval == 1:
            ref = z0_np
            ref_rms = float(np.sqrt(np.mean(ref**2)))
            row["z0_rms"] = round(ref_rms, 4)
        else:
            diff = np.abs(z0_np - ref)
            rel = float(np.sqrt(np.mean((z0_np - ref) ** 2))) / max(ref_rms, 1e-9)
            row.update({
                "max_abs_dev_z0": round(float(diff.max()), 4),
                "rel_rms_dev_z0": round(rel, 5),
            })
        results[f"encoder_interval={interval}"] = row
        print(json.dumps({f"encoder_interval={interval}": row}), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
