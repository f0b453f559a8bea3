"""ARCHIVED flash-attention variants — measured dead ends, kept for the record.

None of these are wired into production (`vface_tpu/models/unet.py` gates
only `jax.nn.dot_product_attention` at ds1 and `flash_attention_v5` at ds2;
`flash_attention`/`flash_attention_v2` in `pallas_attention.py` remain live
as the VMEM-guard fallback and the training backward). This module exists so
the hot module contains only shipping kernels (round-3 VERDICT weak #8)
while the measured verdicts stay reproducible via the bench scripts.

Measured verdicts (v5e, SD ds1/ds2 shapes; scripts/bench_attention.py,
scripts/bench_attn_v56.py, PLAN.md rounds 2-3):

* **v3** — transposed (dh, N) layout, full K/V staged per grid step: hit
  Mosaic's VMEM stack limit at the SD shapes (full bf16[96,40,4096] staged);
  never competitive once blocked. Layout idea lives on in v4/v6.
* **v4** — transposed layout with per-k-block DMA: compiles, but measured
  SLOWER than `jax.nn.dot_product_attention` at ds1 (the only place the
  3.2x lane-padding saving could matter) — the fp32-operand matmuls cost
  more than the layout saves.
* **v6** — bf16-operand transposed layout: loses to v5 (natural layout) at
  ds2 — the PV full-lane-width win doesn't cover the extra transposes at
  SD's N=1024-4096 / dh=40 operating points.

The kernels are unchanged from their last live revision; run them through
the bench scripts to reproduce the numbers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vface_tpu.ops.pallas_attention import NEG_INF, _on_tpu


def _flash_kernel_v3(qt_ref, kt_ref, vt_ref, o_ref, *, block_k, kv_len, scale):
    """Grid: (batch*heads, q_blocks). All tensors transposed: (dh, N)."""
    qt = qt_ref[0].astype(jnp.float32)  # (dh, Bq)
    bq = qt.shape[1]
    dh = qt.shape[0]
    n_kb = kv_len // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry  # m/l (Bq, 1); acc (dh, Bq)
        kt = kt_ref[0, :, pl.ds(i * block_k, block_k)].astype(jnp.float32)  # (dh, Bk)
        vt = vt_ref[0, :, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        s = jax.lax.dot_general(
            qt, kt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (Bq, Bk)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # (Bq, Bk)
        alpha = jnp.exp(m_prev - m_new)  # (Bq, 1)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            vt, p, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (dh, Bq)
        acc = acc * alpha[:, 0][None, :] + pv
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    a0 = jnp.zeros((dh, bq), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_kb, body, (m0, l0, a0))
    o_ref[0] = (acc / l[:, 0][None, :]).astype(o_ref.dtype)


def flash_attention_v3(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """(B, N, D) self-attention in the transposed (dh, N) layout."""
    b, nq, d = q.shape
    nk = k.shape[1]
    h = num_heads
    dh = d // h
    scale = dh**-0.5

    block_q = min(block_q, nq)
    block_k = min(block_k, nk)
    if nq % block_q or nk % block_k or not (interpret or _on_tpu()):
        from vface_tpu.ops.attention import multi_head_attention

        return multi_head_attention(q, k, v, num_heads, dtype=q.dtype)

    def split_heads_t(x, n):
        # (B, N, D) → (B*h, dh, N): dh on sublanes, N on lanes
        return x.reshape(b, n, h, dh).transpose(0, 2, 3, 1).reshape(b * h, dh, n)

    qt, kt, vt = split_heads_t(q, nq), split_heads_t(k, nk), split_heads_t(v, nk)
    grid = (b * h, nq // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel_v3, block_k=block_k, kv_len=nk, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, dh, block_q), lambda g, i: (g, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, nk), lambda g, i: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, nk), lambda g, i: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, dh, block_q), lambda g, i: (g, 0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, dh, nq), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(qt, kt, vt)
    # (B*h, dh, N) → (B, N, D)
    return out.reshape(b, h, dh, nq).transpose(0, 3, 1, 2).reshape(b, nq, d)


def _flash_kernel_v4(qt_ref, kt_ref, vt_ref, o_ref, m_scr, l_scr, acc_scr, *, scale):
    """Grid: (batch*heads, q_blocks, k_blocks) — transposed (dh, N) layout
    with K/V DMA'd per k-block (v3 staged the full K/V per grid step, which
    hit Mosaic's VMEM stack limit at the SD shapes; blocking fixes that while
    keeping the layout win: PV's output dim is Bq-on-lanes, so the 40-wide dh
    never pads to 128 on the output side)."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    qt = qt_ref[0].astype(jnp.float32)  # (dh, Bq)
    kt = kt_ref[0].astype(jnp.float32)  # (dh, Bk)
    vt = vt_ref[0].astype(jnp.float32)  # (dh, Bk)

    s = jax.lax.dot_general(
        qt, kt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Bq, Bk)
    m_prev = m_scr[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)  # (Bq, 1)
    l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        vt, p, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (dh, Bq)
    acc_scr[:] = acc_scr[:] * alpha[:, 0][None, :] + pv
    m_scr[:] = m_new

    @pl.when(kb == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:][:, 0][None, :]).astype(o_ref.dtype)


def flash_attention_v4(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """(B, N, D) self-attention, transposed (dh, N) layout, k-blocked grid."""
    b, nq, d = q.shape
    nk = k.shape[1]
    h = num_heads
    dh = d // h
    scale = dh**-0.5

    block_q = min(block_q, nq)
    block_k = min(block_k, nk)
    if nq % block_q or nk % block_k or not (interpret or _on_tpu()):
        from vface_tpu.ops.attention import multi_head_attention

        return multi_head_attention(q, k, v, num_heads, dtype=q.dtype)

    def split_heads_t(x, n):
        return x.reshape(b, n, h, dh).transpose(0, 2, 3, 1).reshape(b * h, dh, n)

    qt, kt, vt = split_heads_t(q, nq), split_heads_t(k, nk), split_heads_t(v, nk)
    grid = (b * h, nq // block_q, nk // block_k)
    out = pl.pallas_call(
        functools.partial(_flash_kernel_v4, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, dh, block_q), lambda g, i, j: (g, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, block_k), lambda g, i, j: (g, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, block_k), lambda g, i, j: (g, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, dh, block_q), lambda g, i, j: (g, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, dh, nq), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((dh, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qt, kt, vt)
    return out.reshape(b, h, dh, nq).transpose(0, 3, 1, 2).reshape(b, nq, d)


def _flash_kernel_v6(qt_ref, kt_ref, vt_ref, o_ref, *, block_k, kv_len, scale):
    """Grid: (batch*heads, q_blocks); transposed (dh, N) layout, bf16 operands.

    QK^T contracts over dh (sublane dim — the unavoidable 40/128 MXU ceiling)
    but PV contracts over Bk with output (dh, Bq): full lane width, zero
    padding waste on the accumulator."""
    qt = qt_ref[0]  # (dh, Bq), input dtype
    dh, bq = qt.shape
    n_kb = kv_len // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry  # m/l (Bq, 1); acc (dh, Bq) fp32
        kt = kt_ref[0, :, pl.ds(i * block_k, block_k)]
        vt = vt_ref[0, :, pl.ds(i * block_k, block_k)]
        s = jax.lax.dot_general(
            qt, kt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (Bq, Bk) fp32
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            vt, p.astype(vt.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (dh, Bq)
        acc = acc * alpha[:, 0][None, :] + pv
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    a0 = jnp.zeros((dh, bq), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_kb, body, (m0, l0, a0))
    o_ref[0] = (acc / l[:, 0][None, :]).astype(o_ref.dtype)


def flash_attention_v6(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Transposed-layout flash with bf16 MXU operands."""
    b, nq, d = q.shape
    nk = k.shape[1]
    h = num_heads
    dh = d // h
    scale = dh**-0.5
    block_q = min(block_q, nq)
    block_k = min(block_k, nk)
    if nq % block_q or nk % block_k or not (interpret or _on_tpu()):
        from vface_tpu.ops.attention import multi_head_attention

        return multi_head_attention(q, k, v, num_heads, dtype=q.dtype)

    def split_heads_t(x, n):
        return x.reshape(b, n, h, dh).transpose(0, 2, 3, 1).reshape(b * h, dh, n)

    qt, kt, vt = split_heads_t(q, nq), split_heads_t(k, nk), split_heads_t(v, nk)
    grid = (b * h, nq // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel_v6, block_k=block_k, kv_len=nk, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, dh, block_q), lambda g, i: (g, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, nk), lambda g, i: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, nk), lambda g, i: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, dh, block_q), lambda g, i: (g, 0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, dh, nq), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(qt, kt, vt)
    return out.reshape(b, h, dh, nq).transpose(0, 3, 1, 2).reshape(b, nq, d)
