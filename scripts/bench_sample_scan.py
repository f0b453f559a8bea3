#!/usr/bin/env python
"""Per-step cost of the PRODUCTION sampling scan vs the bare UNet eval.

bench_superpack_ablate round 4: the super-pack spends ~27.5 s in UNet scans
(92%) — ~183 ms per eval in-program vs 167.9 ms for the bare 2-chunk eval
(bench_unet_ablate). This script decomposes that ~15 ms/eval of in-scan
overhead: hook math (FSAI fft combine at 5 ds1 sites + FGATS flow warps),
DDIM step arithmetic, latent/inpaint concats.

Variants (all 2-chunk recon-free, b=24 rows, 20-step scans):
  hooked_flow   production: flow_fix injection + FGATS flow (the real path)
  hooked        fft injection, no flow (isolates the FGATS warp cost)
  no_hooks      injection off (isolates FSAI fft combine cost)
  bare_scan     scan of bare unet.apply + trivial update (isolates ddim/
                concat overhead vs the hook costs)

Run: VFACE_PLATFORM= python scripts/bench_sample_scan.py
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

STEPS = 20
F = 12  # frames per pack (2 windows x 6)


def main():
    from vface_tpu.models import InjectionSpec, ModelConfig, VFaceModel
    from vface_tpu.ops.attention import FusionConfig
    from vface_tpu.samplers import vface_sample

    print(f"platform: {jax.devices()[0].platform}  F={F} steps={STEPS}", flush=True)
    model = VFaceModel(ModelConfig.sd_v1_inpaint())
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    hl = model.cfg.latent_size
    d = model.cfg.unet.context_dim

    ks = jax.random.split(jax.random.PRNGKey(1), 8)
    x_T = jax.random.normal(ks[0], (F, hl, hl, 4))
    cond = jax.random.normal(ks[1], (F, 1, d))
    uncond = jax.random.normal(ks[2], (F, 1, d))
    zi = jax.random.normal(ks[3], (F, hl, hl, 4))
    ml = jnp.ones((F, hl, hl, 1))
    flow = jax.random.normal(ks[4], (F - 1, hl, hl, 2)) * 1.5
    dummy_inv = jnp.zeros((1, F, hl, hl, 4))

    spec_flow = InjectionSpec(
        input_blocks=FusionConfig("flow_fix", split_ratio=0.8), chunks=3
    )
    spec_fft = InjectionSpec(
        input_blocks=FusionConfig("fft", split_ratio=0.8), chunks=3
    )
    spec_off = InjectionSpec(chunks=3)

    results = {}

    def timeit(name, fn, *args):
        t0 = time.perf_counter()
        jax.device_get(jnp.sum(fn(*args)))
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            jax.device_get(jnp.sum(fn(*args)))
        per = (time.perf_counter() - t0) / reps / STEPS * 1e3
        results[name] = round(per, 1)
        print(f"{name:12s}  {per:8.1f} ms/step   (compile+warm {comp:.0f}s)", flush=True)

    def sample(spec, fl):
        def f(params, x_T, cond, uncond, zi, ml, flow):
            z0, _ = vface_sample(
                model, params, x_T, cond, uncond, cond, dummy_inv, zi, ml,
                spec, flow=flow if fl else None, num_steps=STEPS,
                drop_recon_chunk=True,
            )
            return z0
        return jax.jit(f)

    timeit("hooked_flow", sample(spec_flow, True), params, x_T, cond, uncond, zi, ml, flow)
    timeit("hooked", sample(spec_fft, False), params, x_T, cond, uncond, zi, ml, flow)
    timeit("no_hooks", sample(spec_off, False), params, x_T, cond, uncond, zi, ml, flow)

    # bare scan: unet.apply on a fixed (2F, hl, hl, 9) batch, trivial carry
    x9 = jnp.concatenate([jnp.concatenate([x_T, zi, ml], -1)] * 2, axis=0)
    c_in = jnp.concatenate([uncond, cond], axis=0)
    t_in = jnp.full((2 * F,), 500, jnp.int32)

    def bare(params, x9, t_in, c_in):
        def step(c, _):
            eps = model.unet.apply({"params": params["unet"]}, c, t_in, c_in)
            return jnp.concatenate([c[..., :4] * 0.999 + 0.001 * eps, c[..., 4:]], -1), None

        out, _ = jax.lax.scan(step, x9, None, length=STEPS)
        return out

    timeit("bare_scan", jax.jit(bare), params, x9, t_in, c_in)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
