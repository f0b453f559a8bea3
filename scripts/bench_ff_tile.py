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


def _ff_kernel_split(x_ref, wpa_ref, wpg_ref, bpa_ref, bpg_ref, wo_ref, bo_ref,
                     o_ref, *, inner):
    """Split-projection variant: gate dot first, then the a dot — the erf
    VPU epilogue of the gate can overlap the a matmul if Mosaic's scheduler
    allows; also halves the live fp32 intermediate."""
    import jax
    import jax.numpy as jnp

    from vface_tpu.ops.pallas_ff import _gelu_erf

    x = x_ref[...]
    g32 = jax.lax.dot_general(
        x, wpg_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    g = (g32.astype(x.dtype) + bpg_ref[...])
    gact = _gelu_erf(g.astype(jnp.float32)).astype(x.dtype)
    a32 = jax.lax.dot_general(
        x, wpa_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    a = a32.astype(x.dtype) + bpa_ref[...]
    o32 = jax.lax.dot_general(
        a * gact, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = o32.astype(x.dtype) + bo_ref[...]


def _pallas_split(x2, wp, bp, wo, bo, tm):
    import functools

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    m, c = x2.shape
    two_i = wp.shape[1]
    inner = two_i // 2
    wpa, wpg = wp[:, :inner], wp[:, inner:]
    bpa, bpg = bp[:inner].reshape(1, -1), bp[inner:].reshape(1, -1)
    pad = (-m) % tm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ff_kernel_split, inner=inner),
        grid=(x2.shape[0] // tm,),
        in_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0)),
            pl.BlockSpec((c, inner), lambda i: (0, 0)),
            pl.BlockSpec((c, inner), lambda i: (0, 0)),
            pl.BlockSpec((1, inner), lambda i: (0, 0)),
            pl.BlockSpec((1, inner), lambda i: (0, 0)),
            pl.BlockSpec((inner, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], c), x2.dtype),
    )(x2, wpa, wpg, bpa, bpg, wo, bo.reshape(1, -1))
    return out[:m]


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
        for tm in (128, 256, 512):
            try:
                f = jax.jit(lambda x, tm=tm: _pallas_split(x, wp, bp, wo, bo, tm))
                out = f(x)
                jax.device_get(out.ravel()[:4])
                t0 = time.perf_counter()
                for _ in range(REPS):
                    out = f(x)
                jax.device_get(out.ravel()[:4])
                t = (time.perf_counter() - t0) / REPS * 1e3
                results[f"c{c}_split{tm}"] = round(t, 2)
                print(f"  split tm={tm:<5d} {t:8.2f} ms", flush=True)
            except Exception as e:  # noqa: BLE001
                results[f"c{c}_split{tm}"] = f"FAIL {type(e).__name__}"
                print(f"  split tm={tm:<5d} FAIL {type(e).__name__}: {str(e)[:90]}",
                      flush=True)
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
