#!/usr/bin/env python
"""Head-packed ds1 attention experiment (VERDICT r4 next-item 1).

The ds1 attn1 sites (b=24, N=4096, h=8, dh=40; reference op shape
`ldm/modules/attention.py:152-200`) are capped at 40/128 MXU lanes in both
matmuls: QK^T contracts over dh=40, and AV's output minor dim is 40. The
untried layout idea: pack p heads into one contraction —

  Q' (p·N, p·dh) block-diagonal (head h's rows occupy feature slot h),
  K' (N, p·dh)   all p heads' features concatenated,
  logits = Q'K'^T (p·N, N): row-block h = q_h k_h^T exactly (disjoint
  feature support zeroes the cross terms — no masking needed in this
  asymmetric form), at p·dh/128 lane fill and p× the FLOPs;
  AV packs the same way on the output side ((p·N, N) @ (N, p·dh), slice the
  diagonal blocks).

MXU pass arithmetic says this should be a WASH, not a win: a (N,40)@(40,N)
matmul already pads its contraction to one 128-deep pass per output tile, so
per head-group the packed layout performs p·(N/128)² tile-passes — exactly
the p separate heads' count — while tripling softmax/HBM logit traffic.
This script measures it to settle VERDICT r4's open question either way.

Run on the chip: VFACE_PLATFORM= python scripts/bench_attn_headpack.py
"""

from __future__ import annotations

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


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.device_get(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.device_get(jnp.sum(out))
    return (time.perf_counter() - t0) / reps * 1e3


def einsum_attention(q, k, v, h):
    """The production einsum path (materialized logits) — the apples-to-apples
    baseline for the packed variants, which also materialize."""
    b, n, d = q.shape
    dh = d // h
    scale = dh**-0.5
    qh = q.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
    sim = jnp.einsum("bhid,bhjd->bhij", qh, kh, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(sim * scale, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhij,bhjd->bhid", attn, vh, preferred_element_type=jnp.float32)
    return out.astype(q.dtype).transpose(0, 2, 1, 3).reshape(b, n, d)


def packed_attention(q, k, v, h, p):
    """Head-packed attention: groups of p heads share one (p·N, p·dh)
    contraction on BOTH matmuls. h pads up to a multiple of p with zero
    heads (p=3 → 9 'heads' of the 8, 120-lane groups — VERDICT r4's exact
    proposal)."""
    b, n, d = q.shape
    dh = d // h
    g = -(-h // p)
    pad = g * p - h
    scale = dh**-0.5

    # (b, g, p, n, dh), zero-padded to g*p heads
    def grp(x):
        xh = x.reshape(b, n, h, dh)
        if pad:
            xh = jnp.concatenate(
                [xh, jnp.zeros((b, n, pad, dh), x.dtype)], axis=2
            )
        return xh.reshape(b, n, g, p, dh).transpose(0, 2, 3, 1, 4)

    qg, kg, vg = grp(q), grp(k), grp(v)
    # block-diagonal Q': (b, g, p*n, p*dh)
    eye = jnp.eye(p, dtype=q.dtype)  # (p, p) head-slot selector
    qb = jnp.einsum("bgpnd,pq->bgpnqd", qg, eye).reshape(b, g, p * n, p * dh)
    # K'/V': heads concatenated along features: (b, g, n, p*dh)
    kc = kg.transpose(0, 1, 3, 2, 4).reshape(b, g, n, p * dh)
    vc = vg.transpose(0, 1, 3, 2, 4).reshape(b, g, n, p * dh)
    sim = jnp.einsum("bgid,bgjd->bgij", qb, kc, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(sim * scale, axis=-1).astype(q.dtype)  # (b,g,p*n,n)
    out = jnp.einsum("bgij,bgjd->bgid", attn, vc, preferred_element_type=jnp.float32)
    # slice diagonal blocks: row-block h's output columns h*dh:(h+1)*dh
    out = out.astype(q.dtype).reshape(b, g, p, n, p, dh)
    out = jnp.einsum("bgpnqd,pq->bgpnd", out, eye)  # select q == p slot
    out = out.transpose(0, 3, 1, 2, 4).reshape(b, n, g * p, dh)
    return out[:, :, :h].reshape(b, n, d)


def packed_qk_only(q, k, v, h, p):
    """Pack only the QK^T side; AV runs per-head as usual."""
    b, n, d = q.shape
    dh = d // h
    g = h // p
    scale = dh**-0.5

    def grp(x):
        return x.reshape(b, n, g, p, dh).transpose(0, 2, 3, 1, 4)

    qg, kg, vg = grp(q), grp(k), grp(v)
    eye = jnp.eye(p, dtype=q.dtype)
    qb = jnp.einsum("bgpnd,pq->bgpnqd", qg, eye).reshape(b, g, p * n, p * dh)
    kc = kg.transpose(0, 1, 3, 2, 4).reshape(b, g, n, p * dh)
    sim = jnp.einsum("bgid,bgjd->bgij", qb, kc, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(sim * scale, axis=-1).astype(q.dtype)
    attn = attn.reshape(b, g, p, n, n)
    out = jnp.einsum("bgpij,bgpjd->bgpid", attn, vg, preferred_element_type=jnp.float32)
    return out.astype(q.dtype).transpose(0, 3, 1, 2, 4).reshape(b, n, d)


def main():
    h, dh = 8, 40
    d = h * dh
    b, n = 24, 4096
    print(f"platform: {jax.devices()[0].platform}", flush=True)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (b, n, d), jnp.bfloat16)
    k = jax.random.normal(k2, (b, n, d), jnp.bfloat16)
    v = jax.random.normal(k3, (b, n, d), jnp.bfloat16)

    # numerics check at a small shape (CPU-safe)
    qs, ks, vs = (x[:2, :256] for x in (q, k, v))
    ref = np.asarray(einsum_attention(qs, ks, vs, h), np.float32)
    for p in (2, 3, 4):
        got = np.asarray(packed_attention(qs, ks, vs, h, p), np.float32)
        err = np.abs(got - ref).max()
        print(f"numerics packed p={p}: max abs err {err:.5f} (bf16 tolerance)")
        assert err < 0.1
        if h % p == 0:
            got = np.asarray(packed_qk_only(qs, ks, vs, h, p), np.float32)
            err = np.abs(got - ref).max()
            print(f"numerics qk-only p={p}: max abs err {err:.5f}")
            assert err < 0.1

    def run_dpa(q, k, v):
        return jax.nn.dot_product_attention(
            q.reshape(b, n, h, dh), k.reshape(b, n, h, dh), v.reshape(b, n, h, dh)
        ).reshape(b, n, d)

    print(f"== b={b} n={n} h={h} dh={dh} bf16 ==", flush=True)
    print(f"  xla_dpa            {timeit(jax.jit(run_dpa), q, k, v):8.3f} ms", flush=True)
    print(f"  einsum (unpacked)  {timeit(jax.jit(lambda q,k,v: einsum_attention(q,k,v,h)), q, k, v):8.3f} ms", flush=True)
    for p in (2, 3, 4):
        for name, fn in (("packed_full", packed_attention), ("packed_qk", packed_qk_only)):
            if fn is packed_qk_only and h % p:
                continue
            try:
                t = timeit(jax.jit(lambda q, k, v, fn=fn, p=p: fn(q, k, v, h, p)), q, k, v)
                print(f"  {name} p={p}      {t:8.3f} ms", flush=True)
            except Exception as e:
                print(f"  {name} p={p}      FAIL {type(e).__name__}: {str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
