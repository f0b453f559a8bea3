#!/usr/bin/env python
"""Attention microbenchmark at the SD/VFace hot shapes (on the real chip).

Attention is ~61% of the VFace denoiser step (PLAN.md perf log); SD's dh=40
is hostile to the 128-lane VMEM tiling, so layout matters more than flashing.
Variants timed at the step's two dominant shapes (attn1 at ds1 and ds2 for
the 2-chunk recon-free batch of a 6-frame window):

  einsum   — multi_head_attention (XLA)
  flash_v2 — whole-KV-in-VMEM Pallas kernel, (N, dh) layout
  flash_v3 — transposed (dh, N) layout (dh on sublanes; no 40→128 padding)
  jax_fa   — jax.experimental.pallas.ops.tpu.flash_attention (if available)
  xla_dpa  — jax.nn.dot_product_attention (if available)

Run: VFACE_PLATFORM= python scripts/bench_attention.py   (axon = real chip)
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
    jax.device_get(jnp.sum(out))  # force completion (block_until_ready no-op on axon)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jnp.sum(out))
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    from vface_tpu.ops.attention import multi_head_attention
    from vface_tpu.ops._archive_attention import (
        flash_attention_v3,
        flash_attention_v4,
        flash_attention_v6,
    )
    from vface_tpu.ops.pallas_attention import (
        flash_attention_v2,
        flash_attention_v5,
    )

    h, dh = 8, 40
    d = h * dh
    print(f"platform: {jax.devices()[0].platform}")
    cases = [("ds1 (64², 2-chunk w6)", 12, 4096), ("ds2 (32²)", 12, 1024)]
    if "--packed" in sys.argv:
        # packed-window batches (batch_windows 2/4 → b=24/48)
        cases += [("ds1 packed bw=2", 24, 4096), ("ds1 packed bw=4", 48, 4096),
                  ("ds2 packed bw=2", 24, 1024), ("ds2 packed bw=4", 48, 1024)]
    for name, b, n in cases:
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(k1, (b, n, d), jnp.bfloat16)
        k = jax.random.normal(k2, (b, n, d), jnp.bfloat16)
        v = jax.random.normal(k3, (b, n, d), jnp.bfloat16)

        results = {}
        results["einsum"] = timeit(
            jax.jit(lambda q, k, v: multi_head_attention(q, k, v, h, dtype=q.dtype)), q, k, v
        )
        results["flash_v2"] = timeit(
            jax.jit(lambda q, k, v: flash_attention_v2(q, k, v, h)), q, k, v
        )
        for bq in (512, 1024, 2048):
            if bq <= n and n % bq == 0:
                try:
                    results[f"flash_v5 bq={bq}"] = timeit(
                        jax.jit(
                            lambda q, k, v, bq=bq: flash_attention_v5(
                                q, k, v, h, block_q=bq, block_k=min(1024, n)
                            )
                        ),
                        q, k, v,
                    )
                except Exception as e:
                    results[f"flash_v5 bq={bq}"] = f"FAIL {type(e).__name__}"
                try:
                    results[f"flash_v6 bq={bq}"] = timeit(
                        jax.jit(
                            lambda q, k, v, bq=bq: flash_attention_v6(
                                q, k, v, h, block_q=bq, block_k=min(1024, n)
                            )
                        ),
                        q, k, v,
                    )
                except Exception as e:
                    results[f"flash_v6 bq={bq}"] = f"FAIL {type(e).__name__}"
        for bq in (512, 1024, 2048):
            if n % bq == 0 or bq <= n:
                try:
                    results[f"flash_v3 bq={min(bq, n)}"] = timeit(
                        jax.jit(
                            lambda q, k, v, bq=bq: flash_attention_v3(
                                q, k, v, h, block_q=bq, block_k=min(bq, n)
                            )
                        ),
                        q, k, v,
                    )
                except Exception as e:  # Mosaic compile failures are informative
                    results[f"flash_v3 bq={min(bq, n)}"] = f"FAIL {type(e).__name__}"
        for bq, bk in ((256, 512), (512, 512), (512, 1024), (1024, 1024)):
            if n % bq == 0 and n % bk == 0:
                try:
                    results[f"flash_v4 bq={bq} bk={bk}"] = timeit(
                        jax.jit(
                            lambda q, k, v, bq=bq, bk=bk: flash_attention_v4(
                                q, k, v, h, block_q=bq, block_k=bk
                            )
                        ),
                        q, k, v,
                    )
                except Exception as e:
                    results[f"flash_v4 bq={bq} bk={bk}"] = f"FAIL {type(e).__name__}"
        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                flash_attention as jax_fa,
            )

            def run_jax_fa(q, k, v):
                qh = q.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
                kh = k.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
                vh = v.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
                o = jax_fa(qh, kh, vh, sm_scale=dh**-0.5)
                return o.transpose(0, 2, 1, 3).reshape(b, n, d)

            results["jax_fa"] = timeit(jax.jit(run_jax_fa), q, k, v)
        except Exception as e:
            results["jax_fa"] = f"FAIL {type(e).__name__}: {str(e)[:80]}"
        try:
            from jax.experimental.pallas.ops.tpu.splash_attention import (
                splash_attention_kernel as sk,
                splash_attention_mask as sm,
            )

            mask = sm.MultiHeadMask([sm.FullMask((n, n)) for _ in range(h)])
            for bq, bkv in ((512, 1024), (1024, 1024), (2048, 2048)):
                if bq > n or bkv > n:
                    continue
                bs = sk.BlockSizes(
                    block_q=bq, block_kv=bkv, block_kv_compute=bkv,
                )
                kern = sk.make_splash_mha_single_device(mask=mask, block_sizes=bs)

                def run_splash(q, k, v, kern=kern):
                    qh = q.reshape(b, n, h, dh).transpose(0, 2, 1, 3) * (dh ** -0.5)
                    kh = k.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
                    vh = v.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
                    o = jax.vmap(kern)(qh, kh, vh)
                    return o.transpose(0, 2, 1, 3).reshape(b, n, d)

                try:
                    results[f"splash bq={bq} bkv={bkv}"] = timeit(
                        jax.jit(run_splash), q, k, v
                    )
                except Exception as e:
                    results[f"splash bq={bq} bkv={bkv}"] = (
                        f"FAIL {type(e).__name__}: {str(e)[:60]}"
                    )
        except Exception as e:
            results["splash"] = f"FAIL {type(e).__name__}: {str(e)[:80]}"
        try:
            def run_dpa(q, k, v):
                qh = q.reshape(b, n, h, dh)
                kh = k.reshape(b, n, h, dh)
                vh = v.reshape(b, n, h, dh)
                return jax.nn.dot_product_attention(qh, kh, vh).reshape(b, n, d)

            results["xla_dpa"] = timeit(jax.jit(run_dpa), q, k, v)
        except Exception as e:
            results["xla_dpa"] = f"FAIL {type(e).__name__}: {str(e)[:80]}"

        print(f"\n== {name}: b={b} n={n} h={h} dh={dh} bf16 ==")
        for kname, val in results.items():
            print(f"  {kname:20s} {val if isinstance(val, str) else f'{val:8.3f} ms'}")


if __name__ == "__main__":
    main()
