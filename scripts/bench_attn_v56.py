#!/usr/bin/env python
"""Focused on-chip A/B: bf16-operand flash kernels (v5/v6) vs xla_dpa.

Hypothesis: every earlier Pallas variant lost to dot_product_attention
because it cast q/k/v to fp32 BEFORE the MXU dots (fp32 matmul = multi-pass
emulation on v5e). v5/v6 keep bf16 operands with fp32 accumulation — the
same discipline as dpa and the production einsum path.

Run: VFACE_PLATFORM= python scripts/bench_attn_v56.py
"""

from __future__ import annotations

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


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.device_get(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jnp.sum(out))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from vface_tpu.ops._archive_attention import flash_attention_v6
    from vface_tpu.ops.pallas_attention import flash_attention_v5

    h, dh = 8, 40
    d = h * dh
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    for b, n, blocks in ((24, 4096, (512, 1024, 2048)), (24, 1024, (512, 1024))):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(k1, (b, n, d), jnp.bfloat16)
        k = jax.random.normal(k2, (b, n, d), jnp.bfloat16)
        v = jax.random.normal(k3, (b, n, d), jnp.bfloat16)
        print(f"== b={b} n={n} h={h} dh={dh} bf16 ==", flush=True)

        def run_dpa(q, k, v):
            return jax.nn.dot_product_attention(
                q.reshape(b, n, h, dh),
                k.reshape(b, n, h, dh),
                v.reshape(b, n, h, dh),
            ).reshape(b, n, d)

        print(f"  xla_dpa          {timeit(jax.jit(run_dpa), q, k, v):8.3f} ms", flush=True)
        for bq in blocks:
            if n % bq:
                continue
            for name, fn in (("v5", flash_attention_v5), ("v6", flash_attention_v6)):
                try:
                    t = timeit(
                        jax.jit(
                            lambda q, k, v, fn=fn, bq=bq: fn(
                                q, k, v, h, block_q=bq, block_k=min(1024, n)
                            )
                        ),
                        q, k, v,
                    )
                    print(f"  flash_{name} bq={bq:<5d} {t:8.3f} ms", flush=True)
                except Exception as e:
                    print(f"  flash_{name} bq={bq:<5d} FAIL {type(e).__name__}: {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
