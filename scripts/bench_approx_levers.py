#!/usr/bin/env python
"""Approx-track levers: per-lever deviation bounds + the composed operating
point's wall clock (VERDICT r4 next-item 3b).

Levers (SwapOptions):
  * encoder_interval 2/3/4 — "Faster Diffusion" encoder propagation; z0
    deviation bound extends the pinned ladder (scripts/bench_approx_bound.py:
    interval 2 = 1.87%, 3 = 3.14% rel RMS at 512², perturbed weights).
  * raft_iters 20→8 — flow refinement truncation (timing here; the flow /
    output-space bound is measured with the trained tiny bundle in
    scripts/measure_approx_bounds_trained.py — no trained RAFT weights exist
    in this environment, so an EPE-vs-trained-RAFT bound is not measurable).
  * background_res 512→256 — quarter-cost background-consistency roundtrip
    (output bound on trained-VAE weights in the same trained-bundle script;
    a random-init VAE saturates the [0,1] clip and masks the delta).

Stage 1: 512² single-window z0 bound for encoder_interval=4 (extends the
         ladder with the same methodology/seeds as bench_approx_bound.py).
Stage 2: super-pack wall clock for composed candidates:
         A = (interval=3, raft8, bg256)   B = (interval=4, raft8, bg256)
         vs the current approx line (interval=2, exact flow/bg).

Run on the chip: VFACE_PLATFORM= python scripts/bench_approx_levers.py
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


def perturbed_flagship_params(model):
    import zlib

    params = jax.jit(model.init)(jax.random.PRNGKey(0))

    def _perturb(path, x):
        if not jnp.issubdtype(x.dtype, jnp.floating):
            return x
        key = jax.random.fold_in(
            jax.random.PRNGKey(42), zlib.crc32(jax.tree_util.keystr(path).encode())
        )
        return x + 0.02 * jax.random.normal(key, x.shape, x.dtype)

    return jax.jit(lambda p: jax.tree_util.tree_map_with_path(_perturb, p))(params)


def stage1_interval4_bound(model, params):
    """Same window/seed setup as bench_approx_bound.py; intervals 1 and 4."""
    from vface_tpu.pipelines.video_swap import SwapOptions, VideoSwapPipeline
    from vface_tpu.samplers.inversion import ddim_invert
    from vface_tpu.samplers.vface import vface_sample
    from vface_tpu.ops.warp import resize_flow

    f, s = 6, 512
    d = model.cfg.unet.context_dim
    cond = jax.random.normal(jax.random.PRNGKey(2), (f, 1, d))
    uncond = jax.random.normal(jax.random.PRNGKey(3), (f, 1, d))
    inv_c = jax.random.normal(jax.random.PRNGKey(4), (f, 1, d))
    flow = jax.random.normal(jax.random.PRNGKey(7), (f - 1, s, s, 2))
    hl = model.cfg.latent_size
    z = jax.random.normal(jax.random.PRNGKey(9), (f, hl, hl, 4))
    mask_lat = jnp.ones((f, hl, hl, 1))
    flow_q = resize_flow(flow, hl, hl)

    out = {}
    ref = ref_rms = None
    for interval in (1, 4):
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
        _ = float(jax.device_get(jnp.mean(z0)))
        t0 = time.perf_counter()
        for _ in range(2):
            _ = float(jax.device_get(jnp.mean(z0_jit(params, z, inv_c))))
        dt = (time.perf_counter() - t0) / 2
        z0_np = np.asarray(jax.device_get(z0))
        if interval == 1:
            ref, ref_rms = z0_np, float(np.sqrt(np.mean(z0_np**2)))
            out["interval1_s"] = round(dt, 3)
        else:
            rel = float(np.sqrt(np.mean((z0_np - ref) ** 2))) / max(ref_rms, 1e-9)
            out.update({
                "interval4_s": round(dt, 3),
                "interval4_rel_rms_dev_z0": round(rel, 5),
                "interval4_max_abs_dev_z0": round(float(np.abs(z0_np - ref).max()), 4),
            })
        print(json.dumps(out), flush=True)
    return out


def stage2_composed_timing(model):
    """Super-pack wall clock of the composed approx candidates (bench.py's
    run_operating_point, same harness)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from vface_tpu.pipelines.video_swap import SwapOptions

    out = {}
    for name, opts in (
        ("approx_i2", SwapOptions(batch_windows=2, invert_packs=2,
                                  encoder_interval=2)),
        ("composedA_i3_raft8_bg256", SwapOptions(
            batch_windows=2, invert_packs=2, encoder_interval=3,
            raft_iters=8, background_res=256)),
        ("composedB_i4_raft8_bg256", SwapOptions(
            batch_windows=2, invert_packs=2, encoder_interval=4,
            raft_iters=8, background_res=256)),
    ):
        f, times = bench.run_operating_point(model, opts, n_rep=2)
        dt = float(np.median(times))
        out[name] = {"pack_s": round(dt, 2), "fps": round(f / dt, 4),
                     "vs_a100": round(f / dt / 0.30, 3)}
        print(json.dumps({name: out[name]}), flush=True)
    return out


def main():
    from vface_tpu.models import ModelConfig, VFaceModel

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    model = VFaceModel(ModelConfig.sd_v1_inpaint())
    params = perturbed_flagship_params(model)
    r1 = stage1_interval4_bound(model, params)
    del params
    r2 = stage2_composed_timing(model)
    print(json.dumps({"stage1": r1, "stage2": r2}))


if __name__ == "__main__":
    main()
