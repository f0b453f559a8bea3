#!/usr/bin/env python
"""FeedForward (GEGLU) micro-bench at the UNet ds1 operating shape.

bench_unet_ablate: FF across the 16 transformers costs 37.8 ms of the 177 ms
b=24 eval; its matmul FLOPs bound is ~23 ms on v5e. This isolates the ds1 FF
stack (5 layers, N=4096, C=320, mult 4 — ~1/3 of total FF FLOPs but the
biggest tensors) and times variants to find the lost 40%.

Variants:
  ff          production FeedForward (fp32 erf gelu, fp32 LN in front)
  ff_noln     without the preceding LayerNormF32 — LN share
  ff_bf16gelu gelu evaluated in bf16 (no fp32 cast in the epilogue)
  ff_tanh     tanh-approx gelu (cheaper transcendental)
  ff_nogelu   split+multiply only — gelu share
  dense_floor the two matmuls alone (no split/gate) — MXU floor

Run: VFACE_PLATFORM= python scripts/bench_ff_micro.py [--only=a,b]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from flax import linen as nn

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

B, N, C, MULT, L = 24, 4096, 320, 4, 5
# ds2: --shape=24,1024,640,5   ds4: --shape=24,256,1280,6
for _a in sys.argv[1:]:
    if _a.startswith("--shape="):
        B, N, C, L = (int(v) for v in _a.split("=", 1)[1].split(","))
REPS = 5
DT = jnp.bfloat16


class Stack(nn.Module):
    variant: str

    @nn.compact
    def __call__(self, x):
        from vface_tpu.models.layers import LayerNormF32

        inner = C * MULT
        for i in range(L):
            h = x
            if self.variant != "ff_noln":
                h = LayerNormF32(name=f"ln{i}")(h)
            if self.variant == "ff_fused":
                from vface_tpu.models.unet import FeedForward

                h = FeedForward(C, dtype=DT, use_fused=True, name=f"ff{i}")(h)
                x = x + h
                continue
            if self.variant == "dense_floor":
                h = nn.Dense(inner, dtype=DT, param_dtype=jnp.float32, name=f"p{i}")(h)
                h = nn.Dense(C, dtype=DT, param_dtype=jnp.float32, name=f"o{i}")(h)
            else:
                h = nn.Dense(
                    inner * 2, dtype=DT, param_dtype=jnp.float32, name=f"p{i}"
                )(h)
                a, gate = jnp.split(h, 2, axis=-1)
                if self.variant == "ff_nogelu":
                    h = a * gate
                elif self.variant == "ff_bf16gelu":
                    h = a * jax.nn.gelu(gate, approximate=False)
                elif self.variant == "ff_tanh":
                    h = a * jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(
                        a.dtype
                    )
                else:  # ff / ff_noln: production epilogue
                    h = a * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(
                        a.dtype
                    )
                h = nn.Dense(C, dtype=DT, param_dtype=jnp.float32, name=f"o{i}")(h)
            x = x + h
        return x


def main():
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")
    print(f"platform: {jax.devices()[0].platform}  B={B} N={N} C={C} L={L}", flush=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, C), DT)
    inner = C * MULT
    # per token: C×(2·inner) proj + inner×C out, 2 FLOP per MAC
    flops = L * B * N * 2 * (C * 2 * inner + inner * C)
    print(f"matmul TFLOP/eval: {flops/1e12:.3f}  (v5e floor ~{flops/197e12*1e3:.1f} ms)",
          flush=True)
    results = {}
    for variant in ["ff", "ff_fused", "ff_noln", "ff_bf16gelu", "ff_tanh", "ff_nogelu", "dense_floor"]:
        if only is not None and variant not in only:
            continue
        m = Stack(variant)
        struct = jax.eval_shape(m.init, jax.random.PRNGKey(0), x)
        params = jax.jit(
            lambda: jax.tree.map(lambda s: jnp.full(s.shape, 1e-2, s.dtype), struct)
        )()
        n_iter = 10

        @jax.jit
        def f(p, xx):
            # scan amortizes the ~25-30 ms tunnel dispatch overhead
            def step(c, _):
                return m.apply(p, c) * 0.999, None

            out, _ = jax.lax.scan(step, xx, None, length=n_iter)
            return out

        t0 = time.perf_counter()
        jax.device_get(f(params, x).ravel()[:4])
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(REPS):
            jax.device_get(f(params, x).ravel()[:4])
        per = (time.perf_counter() - t0) / REPS / n_iter
        results[variant] = round(per * 1e3, 2)
        print(f"{variant:12s}  {per*1e3:8.2f} ms   (compile+warm {comp:.1f}s)", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
