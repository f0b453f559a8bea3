#!/usr/bin/env python
"""FGATS warp strategies at the production q/k shape (11, 64, 64, 320).

bench_sample_scan (round 4): the flow_fix sampling step costs +25 ms/eval
over fft-only — 4 warps (q and k at 2 input-block ds1 sites) ≈ 6 ms each
against a ~0.9 ms HBM floor. Candidates:

  stacked     production: 4-tap channel stack (C→4C) + ONE take_along_axis
  four_gather 4 separate take_along_axis at C (less traffic, more gathers)
  onehot_mm   dense bilinear-matrix matmul: W (N, N) built from the flow via
              one-hot compares, out = W @ x ridden on the MXU (bf16 W+x,
              fp32 accumulate)
  stacked_bf16 production path with the operand cast to bf16 (half traffic)

Numerics: stacked/four_gather are identical; onehot_mm reorders the 4-tap
sum (fp32 accumulate) and carries bf16 taps/weights when fed bf16.

Run: VFACE_PLATFORM= python scripts/bench_warp_micro.py
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

B, S, C = 11, 64, 320
REPS = 20


def four_gather(img, coords):
    b, h, w, c = img.shape
    x = jnp.clip(coords[..., 0].astype(jnp.float32), 0, w - 1)
    y = jnp.clip(coords[..., 1].astype(jnp.float32), 0, h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)
    flat = img.reshape(b, h * w, c)

    def take(yy, xx):
        idx = (yy * w + xx).reshape(b, -1, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(x.shape + (c,))

    v00, v01 = take(y0i, x0i), take(y0i, x1i)
    v10, v11 = take(y1i, x0i), take(y1i, x1i)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return (top * (1 - wy) + bot * wy).astype(img.dtype)


def onehot_mm(img, coords, mm_dtype=jnp.bfloat16):
    """out[p] = sum_tap w_tap[p] * img[idx_tap[p]] as ONE (N, N) matmul."""
    b, h, w, c = img.shape
    n = h * w
    x = jnp.clip(coords[..., 0].astype(jnp.float32), 0, w - 1).reshape(b, n)
    y = jnp.clip(coords[..., 1].astype(jnp.float32), 0, h - 1).reshape(b, n)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, w - 1)
    y1i = jnp.minimum(y0i + 1, h - 1)
    cols = jnp.arange(n, dtype=jnp.int32)[None, None, :]  # (1, 1, N)

    def tap(yy, xx, wt):
        idx = (yy * w + xx)[..., None]  # (B, N, 1)
        return (idx == cols).astype(mm_dtype) * wt[..., None].astype(mm_dtype)

    W = (
        tap(y0i, x0i, (1 - wx) * (1 - wy))
        + tap(y0i, x1i, wx * (1 - wy))
        + tap(y1i, x0i, (1 - wx) * wy)
        + tap(y1i, x1i, wx * wy)
    )  # (B, N, N)
    out = jnp.einsum(
        "bpq,bqc->bpc", W, img.reshape(b, n, c).astype(mm_dtype),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, h, w, c).astype(img.dtype)


def main():
    from vface_tpu.ops.warp import grid_sample, warp_by_flow

    print(f"platform: {jax.devices()[0].platform}  shape=({B},{S},{S},{C})", flush=True)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, S, S, C)), jnp.float32)
    flow = jnp.asarray(rng.normal(size=(B, S, S, 2)) * 1.7, jnp.float32)
    ys, xs = jnp.meshgrid(jnp.arange(S, dtype=jnp.float32),
                          jnp.arange(S, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([xs, ys], axis=-1)[None] + flow

    ref = None
    results = {}

    def timeit(name, fn, *args):
        nonlocal ref
        t0 = time.perf_counter()
        out = fn(*args)
        jax.device_get(out.ravel()[:4])
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        jax.device_get(out.ravel()[:4])
        per = (time.perf_counter() - t0) / REPS * 1e3
        if name == "stacked":
            ref = np.asarray(out, np.float32)
            err = 0.0
        else:
            err = float(np.max(np.abs(np.asarray(out, np.float32) - ref)))
        results[name] = round(per, 2)
        print(f"{name:14s} {per:8.2f} ms   maxerr {err:.2e}  (compile {comp:.0f}s)",
              flush=True)

    timeit("stacked", jax.jit(grid_sample), img, coords)
    timeit("four_gather", jax.jit(four_gather), img, coords)
    timeit("onehot_mm", jax.jit(onehot_mm), img, coords)
    timeit("onehot_mm_f32", jax.jit(lambda i, c: onehot_mm(i, c, jnp.float32)),
           img, coords)
    timeit("stacked_bf16",
           jax.jit(lambda i, c: grid_sample(i.astype(jnp.bfloat16), c)), img, coords)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
