#!/usr/bin/env python
"""Micro-bench the pipeline's glue device ops at production shapes.

The super-pack program's UNet/VAE/RAFT stages are measured elsewhere
(bench_batch_scaling / bench_vae_ablate / bench_stages); this times the
remaining device work that has never been measured in isolation:

  paste_back    24x (512p frame <- 512p crop) perspective composite
  quad_crop     24x 512p frame -> 512p aligned crop (gather-based warp)
  resize_flow   (23, 512, 512, 2) -> 64x64 bilinear
  warp_by_flow  FGATS q/k warp at the 64x64 token grid (b=23, C=320)

Gather-based warps are the suspected cost (TPU gathers are slow relative to
MXU work); if paste/crop show up hot, the fix is a one-hot-matmul or
dynamic-slice formulation like the RAFT corr lookup.

Run: VFACE_PLATFORM= python scripts/bench_glue_micro.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

F = 24
S = 512
REPS = 5


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    jax.device_get(jax.tree.leaves(fn(*args))[0].ravel()[:8])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        jax.device_get(jax.tree.leaves(fn(*args))[0].ravel()[:8])
    per = (time.perf_counter() - t0) / REPS
    print(f"{name:14s} {per*1e3:8.2f} ms   (compile {compile_s:.1f}s)", flush=True)
    return per


def main():
    from vface_tpu.ops.warp import resize_flow, warp_by_flow
    from vface_tpu.preprocess.align import paste_back, quad_crop

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    frame = jnp.asarray(rng.uniform(0, 1, (F, S, S, 3)), jnp.float32)
    crop = jnp.asarray(rng.uniform(0, 1, (F, S, S, 3)), jnp.float32)
    mask = jnp.ones((F, S, S, 1), jnp.float32)
    ident = np.tile(np.asarray([1, 0, 0, 0, 1, 0, 0, 0], np.float32), (F, 1))
    coeffs = jnp.asarray(ident)
    quad = jnp.tile(
        jnp.asarray([[10.0, 10.0], [10.0, 500.0], [500.0, 500.0], [500.0, 10.0]]),
        (F, 1, 1),
    )
    flow = jnp.asarray(rng.uniform(-2, 2, (F - 1, S, S, 2)), jnp.float32)
    qk = jnp.asarray(rng.normal(size=(F - 1, 64, 64, 320)), jnp.float32)
    flow_q = jnp.asarray(rng.uniform(-0.5, 0.5, (F - 1, 64, 64, 2)), jnp.float32)

    r = {}
    r["paste_back"] = timeit(
        "paste_back", jax.jit(lambda a, b, c, m: paste_back(a, b, c, m)),
        frame, crop, coeffs, mask,
    )
    r["quad_crop"] = timeit(
        "quad_crop", jax.jit(lambda f, q: quad_crop(f, q, S)), frame, quad
    )
    r["resize_flow"] = timeit(
        "resize_flow", jax.jit(lambda f: resize_flow(f, 64, 64)), flow
    )
    r["warp_by_flow"] = timeit(
        "warp_qk_64", jax.jit(warp_by_flow), qk, flow_q
    )
    print(json.dumps({k: round(v * 1e3, 2) for k, v in r.items()}))


if __name__ == "__main__":
    main()
