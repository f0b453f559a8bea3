#!/usr/bin/env python
"""Tile-size sweep for the fused GEGLU kernel at the ds1/ds2 shapes.

The kernel body is sequential per grid step (matmul1 → erf-gelu VPU →
matmul2), so the MXU idles during the epilogue; smaller M-tiles give Mosaic
more grid steps to pipeline DMA against but pay more weight-block re-reads
from the (cached) VMEM window. This sweeps tm at both live shapes.

Run: VFACE_PLATFORM= python scripts/bench_ff_tile.py
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

REPS = 20


def main():
    from vface_tpu.ops.pallas_ff import _pallas_impl, _ref_impl

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    results = {}
    for c, n in ((320, 24 * 4096), (640, 24 * 1024)):
        inner = 4 * c
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(n, c)) * 0.1, jnp.bfloat16)
        wp = jnp.asarray(rng.normal(size=(c, 2 * inner)) * 0.02, jnp.bfloat16)
        bp = jnp.zeros((2 * inner,), jnp.bfloat16)
        wo = jnp.asarray(rng.normal(size=(inner, c)) * 0.02, jnp.bfloat16)
        bo = jnp.zeros((c,), jnp.bfloat16)
        flops = n * 2 * (c * 2 * inner + inner * c)
        print(f"== C={c} M={n}  floor {flops/197e12*1e3:.2f} ms ==", flush=True)

        t = None
        for tm in (128, 256, 512, 1024):
            try:
                f = jax.jit(lambda x, tm=tm: _pallas_impl(x, wp, bp, wo, bo, False, tm))
                out = f(x)
                jax.device_get(out.ravel()[:4])
                t0 = time.perf_counter()
                for _ in range(REPS):
                    out = f(x)
                jax.device_get(out.ravel()[:4])
                t = (time.perf_counter() - t0) / REPS * 1e3
                results[f"c{c}_tm{tm}"] = round(t, 2)
                print(f"  tm={tm:<5d} {t:8.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                results[f"c{c}_tm{tm}"] = f"FAIL {type(e).__name__}"
                print(f"  tm={tm:<5d} FAIL {type(e).__name__}: {str(e)[:100]}", flush=True)
        fr = jax.jit(lambda x: _ref_impl(x, wp, bp, wo, bo))
        jax.device_get(fr(x).ravel()[:4])
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fr(x)
        jax.device_get(out.ravel()[:4])
        t = (time.perf_counter() - t0) / REPS * 1e3
        results[f"c{c}_xla"] = round(t, 2)
        print(f"  xla     {t:8.2f} ms", flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
