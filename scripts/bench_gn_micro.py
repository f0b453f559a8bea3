#!/usr/bin/env python
"""Isolate the VAE-decoder GroupNorm slowdown in a minimal conv+GN chain.

bench_vae_ablate (fixed) shows: decode 323 ms, stats-free affine 148 ms,
fp32-stats/bf16-apply 280 ms — the *stats reduction* costs ~130-175 ms
(~6.5 ms per GN site) even though a single standalone GN at the same shape
costs 3.4 ms vs a 2.8 ms copy. Something about the conv→GN→silu→conv
composition makes XLA pathological. This micro-bench reproduces the chain
(L× [3×3 conv → norm-variant → silu] at 512²×128, batch 6) and times stats
variants so fixes can iterate here instead of on the 2-min-compile decoder.

Variants:
  affine      y = x*s+b (no stats)            — the floor
  gn          production GroupNorm32 (fp32 stats, fp32 apply)
  gn_sumdt    jnp.sum(x, dtype=f32) directly on bf16 (no x32 tensor)
  gn_hier     hierarchical reduce: sum over W, then H
  gn_mosaic   Pallas stats kernel (fused s1/s2 single pass) + XLA apply

Run: VFACE_PLATFORM= python scripts/bench_gn_micro.py [--only=a,b]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

B, S, C, L = 6, 512, 128, 8
G = 32
EPS = 1e-6
REPS = 5


def stats_xla_f32(x):
    x32 = x.astype(jnp.float32)
    red = tuple(range(1, x.ndim - 1))
    return jnp.sum(x32, axis=red), jnp.sum(x32 * x32, axis=red)


def stats_sumdt(x):
    red = tuple(range(1, x.ndim - 1))
    return (
        jnp.sum(x, axis=red, dtype=jnp.float32),
        jnp.sum(x * x, axis=red, dtype=jnp.float32),
    )


def stats_hier(x):
    x32 = x.astype(jnp.float32)
    s1 = jnp.sum(jnp.sum(x32, axis=2), axis=1)
    s2 = jnp.sum(jnp.sum(x32 * x32, axis=2), axis=1)
    return s1, s2


from vface_tpu.models.layers import _gn_sums_pallas as _prod_gn_sums


def stats_mosaic(x):
    """The PRODUCTION kernel (vface_tpu.models.layers._gn_sums_pallas)."""
    return _prod_gn_sums(x)


def apply_gn(x, s1, s2, scale, bias):
    b, c = s1.shape
    cg = c // G
    count = cg * x.shape[1] * x.shape[2]
    g1 = jnp.sum(s1.reshape(b, G, cg), -1) / count
    g2 = jnp.sum(s2.reshape(b, G, cg), -1) / count
    inv = jax.lax.rsqrt(g2 - g1 * g1 + EPS)
    m_c = jnp.broadcast_to(g1[..., None], (b, G, cg)).reshape(b, c)
    i_c = jnp.broadcast_to(inv[..., None], (b, G, cg)).reshape(b, c)
    a_c = (i_c * scale[None]).astype(x.dtype)
    b_c = (bias[None] - m_c * i_c * scale[None]).astype(x.dtype)
    return x * a_c[:, None, None, :] + b_c[:, None, None, :]


class Chain(nn.Module):
    variant: str

    @nn.compact
    def __call__(self, x):
        for i in range(L):
            x = nn.Conv(C, (3, 3), dtype=jnp.bfloat16, name=f"conv{i}")(x)
            scale = self.param(f"s{i}", nn.initializers.ones, (C,), jnp.float32)
            bias = self.param(f"b{i}", nn.initializers.zeros, (C,), jnp.float32)
            if self.variant == "affine":
                x = x * scale[None, None, None].astype(x.dtype) + bias[
                    None, None, None
                ].astype(x.dtype)
            else:
                stats = {
                    "gn": stats_xla_f32,
                    "gn_sumdt": stats_sumdt,
                    "gn_hier": stats_hier,
                    "gn_mosaic": stats_mosaic,
                }[self.variant]
                s1, s2 = stats(x)
                x = apply_gn(x, s1, s2, scale, bias)
            x = jax.nn.silu(x)
        return x


def main():
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
    print(f"platform: {jax.devices()[0].platform}  B={B} S={S} C={C} L={L}", flush=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, S, C), jnp.bfloat16)
    results = {}
    ref_out = None
    for variant in ["affine", "gn", "gn_sumdt", "gn_hier", "gn_mosaic"]:
        if only is not None and variant not in only:
            continue
        try:
            m = Chain(variant)
            struct = jax.eval_shape(m.init, jax.random.PRNGKey(0), x)
            params = jax.jit(
                lambda: jax.tree.map(lambda s: jnp.full(s.shape, 1e-2, s.dtype), struct)
            )()
            f = jax.jit(lambda p, xx: m.apply(p, xx))
            t0 = time.perf_counter()
            jax.device_get(f(params, x).ravel()[:4])
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(REPS):
                jax.device_get(f(params, x).ravel()[:4])
            per = (time.perf_counter() - t0) / REPS
            results[variant] = round(per * 1e3, 2)
            note = ""
            if variant == "gn":
                ref_out = jax.device_get(f(params, x)[:1, ::64, ::64])
            elif variant.startswith("gn") and ref_out is not None:
                got = jax.device_get(f(params, x)[:1, ::64, ::64])
                import numpy as _np

                note = f"  max|Δ| vs gn = {float(_np.max(_np.abs(got.astype(_np.float32) - ref_out.astype(_np.float32)))):.2e}"
            print(f"{variant:10s}  {per*1e3:8.2f} ms   (compile+warm {comp:.1f}s){note}", flush=True)
        except Exception as e:  # noqa: BLE001
            results[variant] = f"FAIL {type(e).__name__}: {e}"
            print(f"{variant:10s}  FAILED {e}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
