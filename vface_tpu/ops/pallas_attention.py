"""Pallas TPU flash self-attention with the FSAI fusion folded in.

The reference's hooked attention materialises the full (N, N) similarity
matrix per head in HBM (`/root/reference/REFace/ldm/modules/attention.py:
201-222`) after mutating q/k in a monkey-patched forward
(`ldm/models/pnp_utils.py:92-288`). Here the hot path is one Pallas kernel:

* **flash attention** — online-softmax tiling over the key dimension, so the
  64×64-token (N=4096) attn1 never materialises the 4096² matrix; softmax
  statistics live in VMEM scratch.
* **FSAI folded in** — the spectral split `combine_fft_high_low` is linear
  for real inputs (see `vface_tpu.ops.fusion`): q ← donor + (q−donor)·K_low.
  The kernel takes the *pre-mixed* q/k (mixing is one (D,D) MXU matmul done
  by the caller — cheap and fusable), so no extra kernel complexity, and the
  same kernel serves hooked and un-hooked sites.

The kernel is block-tiled (Bq × Bk) with fp32 accumulation; heads and batch
ride the grid. Falls back to the einsum path automatically off-TPU (the
interpreter runs it in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _on_tpu() -> bool:
    """Mosaic kernels only lower on TPU-like backends (incl. the tunneled
    'axon' plugin); anywhere else the einsum path is used automatically."""
    try:
        plat = jax.devices()[0].platform.lower()
    except Exception:
        return False
    return plat in ("tpu", "axon")


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, block_k, kv_len, scale):
    """Grid: (batch*heads, q_blocks, k_blocks). Online softmax over k blocks."""
    kb = pl.program_id(2)

    @pl.when(kb == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)  # (Bq, D)
    k = k_ref[0].astype(jnp.float32)  # (Bk, D)
    v = v_ref[0].astype(jnp.float32)  # (Bk, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Bq, Bk)

    m_prev = m_scr[:]  # (Bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)  # (Bq, Bk)
    alpha = jnp.exp(m_prev - m_new)  # (Bq, 1)
    l_new = alpha * l_scr[:] + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(kb == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    block_q: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """(B, N, D) q/k/v with D = H * dh → (B, N, D). fp32 softmax, MXU matmuls."""
    b, nq, d = q.shape
    nk = k.shape[1]
    h = num_heads
    dh = d // h
    scale = dh**-0.5

    block_q = min(block_q, nq)
    block_k = min(block_k, nk)
    if nq % block_q or nk % block_k or not (interpret or _on_tpu()):
        # shapes the kernel can't tile cleanly (or non-TPU backend):
        # use the reference einsum path
        from vface_tpu.ops.attention import multi_head_attention

        return multi_head_attention(q, k, v, num_heads, dtype=q.dtype)

    def split_heads(x, n):
        return x.reshape(b, n, h, dh).transpose(0, 2, 1, 3).reshape(b * h, n, dh)

    qh = split_heads(q, nq)
    kh = split_heads(k, nk)
    vh = split_heads(v, nk)

    grid = (b * h, nq // block_q, nk // block_k)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, kv_len=nk, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda g, i, j: (g, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dh), lambda g, i, j: (g, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dh), lambda g, i, j: (g, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, dh), lambda g, i, j: (g, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, nq, dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qh, kh, vh)

    return out.reshape(b, h, nq, dh).transpose(0, 2, 1, 3).reshape(b, nq, d)


# ---------------------------------------------------------------------------
# v2: whole-KV-in-VMEM kernel for SD's small head dim
# ---------------------------------------------------------------------------


def _flash_kernel_v2(q_ref, k_ref, v_ref, o_ref, *, block_k, kv_len, scale):
    """Grid: (batch*heads, q_blocks). K/V for the (b,h) live fully in VMEM
    (N=4096, dh<=128 → ~1-2 MB total), so the online-softmax loop is a plain
    fori_loop with no DMA churn and far fewer grid invocations than v1.
    """
    q = q_ref[0].astype(jnp.float32)  # (Bq, D)
    bq = q.shape[0]
    dh = q.shape[1]
    n_kb = kv_len // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    a0 = jnp.zeros((bq, dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_kb, body, (m0, l0, a0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def flash_attention_v2(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """(B, N, D) self-attention; K/V held fully in VMEM per (batch, head).

    Block sizes tuned on v5e at the SD shapes (N=4096, dh=40): 1024²
    measured fastest (13.7 ms vs 14.6 einsum); ≥2048 exceeds VMEM.

    Differentiable with a REAL flash backward: the forward also emits the
    per-row softmax statistics (m, l); the backward recomputes attention
    probabilities blockwise inside two Pallas kernels (dq; dk+dv) so training
    never materialises the (N, N) matrix — this is what unblocks 512²
    training memory (round-2 VERDICT item 9). Falls back to the einsum VJP
    off-TPU / on non-tiling shapes."""
    return _flash_v2_diff(q, k, v, num_heads, block_q, block_k, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_v2_diff(q, k, v, num_heads, block_q, block_k, interpret):
    return _flash_v2_impl(q, k, v, num_heads, block_q, block_k, interpret)


def _can_tile(q, k, block_q, block_k, interpret):
    nq, nk = q.shape[1], k.shape[1]
    bq, bk = min(block_q, nq), min(block_k, nk)
    return nq % bq == 0 and nk % bk == 0 and (interpret or _on_tpu())


def _flash_v2_fwd(q, k, v, num_heads, block_q, block_k, interpret):
    if not _can_tile(q, k, block_q, block_k, interpret):
        return _flash_v2_impl(q, k, v, num_heads, block_q, block_k, interpret), (
            q, k, v, None, None,
        )
    out, m, l = _flash_v2_stats(q, k, v, num_heads, block_q, block_k, interpret)
    return out, (q, k, v, m, l)


def _flash_v2_bwd(num_heads, block_q, block_k, interpret, res, g):
    q, k, v, m, l = res
    if m is None:
        from vface_tpu.ops.attention import multi_head_attention

        _, vjp = jax.vjp(
            lambda q_, k_, v_: multi_head_attention(q_, k_, v_, num_heads, dtype=q_.dtype),
            q, k, v,
        )
        return vjp(g)
    return flash_attention_bwd(
        q, k, v, m, l, g, num_heads,
        block_q=block_q, block_k=block_k, interpret=interpret,
    )


_flash_v2_diff.defvjp(_flash_v2_fwd, _flash_v2_bwd)


def _flash_v2_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
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
    # VMEM budget guard: v2 pins the full K/V per (batch, head) in VMEM.
    # Beyond the SD shapes (e.g. 1024px → N=16384) that would fail at Mosaic
    # compile time; fall back to the k-tiled v1 kernel instead. Budget is
    # conservative: K+V in input dtype + fp32 block copies + q/acc blocks,
    # against ~16 MB/core on v5e.
    kv_bytes = 2 * nk * dh * q.dtype.itemsize + 2 * block_k * dh * 4
    q_bytes = block_q * dh * (q.dtype.itemsize + 2 * 4)
    if kv_bytes + q_bytes > 8 * 1024 * 1024:
        return flash_attention(
            q, k, v, num_heads,
            block_q=min(block_q, 256), block_k=min(block_k, 256),
            interpret=interpret,
        )

    def split_heads(x, n):
        return x.reshape(b, n, h, dh).transpose(0, 2, 1, 3).reshape(b * h, n, dh)

    qh, kh, vh = split_heads(q, nq), split_heads(k, nk), split_heads(v, nk)
    grid = (b * h, nq // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel_v2, block_k=block_k, kv_len=nk, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, dh), lambda g, i: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, dh), lambda g, i: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dh), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, nq, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(qh, kh, vh)
    return out.reshape(b, h, nq, dh).transpose(0, 2, 1, 3).reshape(b, nq, d)


# ---------------------------------------------------------------------------
# flash backward: blockwise recompute, never materialises (N, N)
# ---------------------------------------------------------------------------


def _flash_kernel_v2_stats(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, *, block_k, kv_len, scale):
    """v2 forward that also emits the per-row softmax stats (m, l) the
    backward needs. Same math as _flash_kernel_v2."""
    q = q_ref[0].astype(jnp.float32)
    bq, dh = q.shape
    n_kb = kv_len // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    a0 = jnp.zeros((bq, dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_kb, body, (m0, l0, a0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    m_ref[0] = m
    l_ref[0] = l


def _flash_v2_stats(q, k, v, num_heads, block_q, block_k, interpret):
    """Forward returning (out, m (B*h, nq), l (B*h, nq))."""
    b, nq, d = q.shape
    nk = k.shape[1]
    h = num_heads
    dh = d // h
    scale = dh**-0.5
    block_q = min(block_q, nq)
    block_k = min(block_k, nk)

    def split_heads(x, n):
        return x.reshape(b, n, h, dh).transpose(0, 2, 1, 3).reshape(b * h, n, dh)

    qh, kh, vh = split_heads(q, nq), split_heads(k, nk), split_heads(v, nk)
    grid = (b * h, nq // block_q)
    out, m, l = pl.pallas_call(
        functools.partial(_flash_kernel_v2_stats, block_k=block_k, kv_len=nk, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, dh), lambda g, i: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, dh), lambda g, i: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dh), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, nq, dh), q.dtype),
            jax.ShapeDtypeStruct((b * h, nq, 1), jnp.float32),
            jax.ShapeDtypeStruct((b * h, nq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(qh, kh, vh)
    out = out.reshape(b, h, nq, dh).transpose(0, 2, 1, 3).reshape(b, nq, d)
    return out, m[..., 0], l[..., 0]


def _flash_bwd_dq_kernel(qt_ref, kt_ref, vt_ref, dot_ref, m_ref, l_ref, d_ref, dqt_ref, *, block_k, kv_len, scale):
    """Grid (B*h, q_blocks). All operands transposed (dh, N): the softmax
    stats ride (1, N) rows so every broadcast runs along lanes."""
    qt = qt_ref[0].astype(jnp.float32)  # (dh, Bq)
    dot = dot_ref[0].astype(jnp.float32)  # (dh, Bq)
    m = m_ref[0]  # (1, Bq)
    l = l_ref[0]
    dd = d_ref[0]
    dh, bq = qt.shape
    n_kb = kv_len // block_k

    def body(i, acc):
        kt = kt_ref[0, :, pl.ds(i * block_k, block_k)].astype(jnp.float32)  # (dh, Bk)
        vt = vt_ref[0, :, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        s_t = jax.lax.dot_general(
            kt, qt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (Bk, Bq)
        p_t = jnp.exp(s_t - m) / l
        dp_t = jax.lax.dot_general(
            vt, dot, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Bk, Bq)
        ds_t = p_t * (dp_t - dd)
        return acc + jax.lax.dot_general(
            kt, ds_t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (dh, Bq)

    acc = jax.lax.fori_loop(0, n_kb, body, jnp.zeros((dh, bq), jnp.float32))
    dqt_ref[0] = (acc * scale).astype(dqt_ref.dtype)


def _flash_bwd_dkv_kernel(qt_ref, kt_ref, vt_ref, dot_ref, m_ref, l_ref, d_ref, dkt_ref, dvt_ref, *, block_q, q_len, scale):
    """Grid (B*h, kv_blocks)."""
    kt = kt_ref[0].astype(jnp.float32)  # (dh, Bk)
    vt = vt_ref[0].astype(jnp.float32)
    dh, bk = kt.shape
    n_qb = q_len // block_q

    def body(i, carry):
        dkt, dvt = carry
        sl = pl.ds(i * block_q, block_q)
        qt = qt_ref[0, :, sl].astype(jnp.float32)  # (dh, Bq)
        dot = dot_ref[0, :, sl].astype(jnp.float32)
        m = m_ref[0, :, sl]  # (1, Bq)
        l = l_ref[0, :, sl]
        dd = d_ref[0, :, sl]
        s_t = jax.lax.dot_general(
            kt, qt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (Bk, Bq)
        p_t = jnp.exp(s_t - m) / l
        dvt = dvt + jax.lax.dot_general(
            dot, p_t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (dh, Bk)
        dp_t = jax.lax.dot_general(
            vt, dot, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Bk, Bq)
        ds_t = p_t * (dp_t - dd)
        dkt = dkt + jax.lax.dot_general(
            qt, ds_t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (dh, Bk)
        return dkt, dvt

    z = jnp.zeros((dh, bk), jnp.float32)
    dkt, dvt = jax.lax.fori_loop(0, n_qb, body, (z, z))
    dkt_ref[0] = (dkt * scale).astype(dkt_ref.dtype)
    dvt_ref[0] = dvt.astype(dvt_ref.dtype)


def flash_attention_bwd(
    q, k, v, m, l, g, num_heads, block_q=512, block_k=512, interpret=False
):
    """Flash backward. m/l: (B*h, nq) softmax stats from the stats forward;
    g: output cotangent (B, nq, D). Returns (dq, dk, dv)."""
    b, nq, d = q.shape
    nk = k.shape[1]
    h = num_heads
    dh = d // h
    scale = dh**-0.5
    block_q = min(block_q, nq)
    block_k = min(block_k, nk)

    def split_t(x, n):
        return x.reshape(b, n, h, dh).transpose(0, 2, 3, 1).reshape(b * h, dh, n)

    qt, kt, vt, dot = split_t(q, nq), split_t(k, nk), split_t(v, nk), split_t(g, nq)
    # out is recoverable from stats-free math: D_i = sum_d do*o. Recompute o
    # rows cheaply from p·v? Cheaper: o = forward output — but rather than
    # carry it, compute D with one extra flash forward? No: D = Σ_j p_ij
    # (do_i·v_j) = rowsum(dp * p) — evaluated blockwise needs p anyway. We
    # instead recompute o via the stats: o_i = (Σ_j e^{s-m} v_j)/l — one more
    # pass. Simplest and cheapest in practice: reuse the v2 kernel.
    out = _flash_v2_impl(q, k, v, num_heads, max(block_q, 256), max(block_k, 256), interpret)
    dd = jnp.sum(
        g.astype(jnp.float32).reshape(b, nq, h, dh)
        * out.astype(jnp.float32).reshape(b, nq, h, dh),
        axis=-1,
    ).transpose(0, 2, 1).reshape(b * h, nq)
    m2 = m.reshape(b * h, 1, nq)
    l2 = l.reshape(b * h, 1, nq)
    d2 = dd.reshape(b * h, 1, nq)

    stat_spec_full = pl.BlockSpec((1, 1, nq), lambda gi, i: (gi, 0, 0), memory_space=pltpu.VMEM)
    stat_spec_blk = pl.BlockSpec(
        (1, 1, block_q), lambda gi, i: (gi, 0, i), memory_space=pltpu.VMEM
    )

    dqt = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block_k, kv_len=nk, scale=scale),
        grid=(b * h, nq // block_q),
        in_specs=[
            pl.BlockSpec((1, dh, block_q), lambda gi, i: (gi, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, nk), lambda gi, i: (gi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, nk), lambda gi, i: (gi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, block_q), lambda gi, i: (gi, 0, i), memory_space=pltpu.VMEM),
            stat_spec_blk,
            stat_spec_blk,
            stat_spec_blk,
        ],
        out_specs=pl.BlockSpec((1, dh, block_q), lambda gi, i: (gi, 0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, dh, nq), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(qt, kt, vt, dot, m2, l2, d2)

    dkt, dvt = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=block_q, q_len=nq, scale=scale),
        grid=(b * h, nk // block_k),
        in_specs=[
            pl.BlockSpec((1, dh, nq), lambda gi, j: (gi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, block_k), lambda gi, j: (gi, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, block_k), lambda gi, j: (gi, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, nq), lambda gi, j: (gi, 0, 0), memory_space=pltpu.VMEM),
            stat_spec_full,
            stat_spec_full,
            stat_spec_full,
        ],
        out_specs=[
            pl.BlockSpec((1, dh, block_k), lambda gi, j: (gi, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, block_k), lambda gi, j: (gi, 0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, dh, nk), k.dtype),
            jax.ShapeDtypeStruct((b * h, dh, nk), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(qt, kt, vt, dot, m2, l2, d2)

    def merge_t(x, n):
        return x.reshape(b, h, dh, n).transpose(0, 3, 1, 2).reshape(b, n, h * dh)

    return merge_t(dqt, nq), merge_t(dkt, nk), merge_t(dvt, nk)


# ---------------------------------------------------------------------------
# v5: bf16-operand kernel — keeps the MXU matmuls at native bf16 rate
# ---------------------------------------------------------------------------
#
# v1/v2 cast q/k/v to fp32 BEFORE the dots, which forces fp32 MXU matmuls
# (a multi-pass emulation on v5e — a fraction of bf16 peak).
# XLA's dot_product_attention (the measured ds1 winner, 12 ms/site at b=24)
# feeds the MXU bf16 operands with fp32 accumulation, which is also exactly
# what the production einsum path does (ops/attention.py:227-229:
# preferred_element_type=f32 on bf16 operands, softmax in fp32, probabilities
# cast back to bf16 for the PV matmul). v5 reproduces that dtype discipline
# inside the flash kernel: only the softmax statistics live in fp32; both
# matmuls run bf16×bf16→fp32. Measured dead-end variants (v3/v4 transposed
# fp32 layouts, v6 transposed bf16) live in ops/_archive_attention.py with
# their verdicts.


def _flash_kernel_v5(q_ref, k_ref, v_ref, o_ref, *, block_k, kv_len, scale):
    """Grid: (batch*heads, q_blocks); K/V resident in VMEM; bf16 operands."""
    q = q_ref[0]  # (Bq, dh), input dtype
    bq, dh = q.shape
    n_kb = kv_len // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # fp32 (Bq, Bk)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    a0 = jnp.zeros((bq, dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_kb, body, (m0, l0, a0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def flash_attention_v5(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """v2 structure with bf16 MXU operands (fp32 softmax statistics only).

    Differentiable with the same real flash backward as v2 (stats-emitting
    forward + blockwise-recompute kernels) so the training memory win is
    preserved; the backward recompute runs the v2 (fp32-operand) math, whose
    bf16-rounding-level deviation from the v5 primal is below any gradient
    noise floor (pinned by test_flash_v5_backward_close_to_einsum_vjp)."""
    return _flash_v5_diff(q, k, v, num_heads, block_q, block_k, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_v5_diff(q, k, v, num_heads, block_q, block_k, interpret):
    return _flash_v5_impl(q, k, v, num_heads, block_q, block_k, interpret)


def _flash_v5_fwd(q, k, v, num_heads, block_q, block_k, interpret):
    if not _can_tile(q, k, block_q, block_k, interpret):
        return _flash_v5_impl(q, k, v, num_heads, block_q, block_k, interpret), (
            q, k, v, None, None,
        )
    out, m, l = _flash_v5_stats(q, k, v, num_heads, block_q, block_k, interpret)
    return out, (q, k, v, m, l)


_flash_v5_diff.defvjp(_flash_v5_fwd, _flash_v2_bwd)  # same backward as v2


def _flash_v5_impl(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
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

    def split_heads(x, n):
        return x.reshape(b, n, h, dh).transpose(0, 2, 1, 3).reshape(b * h, n, dh)

    qh, kh, vh = split_heads(q, nq), split_heads(k, nk), split_heads(v, nk)
    grid = (b * h, nq // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel_v5, block_k=block_k, kv_len=nk, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, dh), lambda g, i: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, dh), lambda g, i: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dh), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, nq, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(qh, kh, vh)
    return out.reshape(b, h, nq, dh).transpose(0, 2, 1, 3).reshape(b, nq, d)


def _flash_kernel_v5_stats(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, *, block_k, kv_len, scale):
    """v5 forward that also emits the per-row softmax stats for the flash
    backward. Same bf16-operand math as _flash_kernel_v5."""
    q = q_ref[0]
    bq, dh = q.shape
    n_kb = kv_len // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    a0 = jnp.zeros((bq, dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_kb, body, (m0, l0, a0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    m_ref[0] = m
    l_ref[0] = l


def _flash_v5_stats(q, k, v, num_heads, block_q, block_k, interpret):
    """v5 forward returning (out, m (B*h, nq), l (B*h, nq))."""
    b, nq, d = q.shape
    nk = k.shape[1]
    h = num_heads
    dh = d // h
    scale = dh**-0.5
    block_q = min(block_q, nq)
    block_k = min(block_k, nk)

    def split_heads(x, n):
        return x.reshape(b, n, h, dh).transpose(0, 2, 1, 3).reshape(b * h, n, dh)

    qh, kh, vh = split_heads(q, nq), split_heads(k, nk), split_heads(v, nk)
    grid = (b * h, nq // block_q)
    out, m, l = pl.pallas_call(
        functools.partial(_flash_kernel_v5_stats, block_k=block_k, kv_len=nk, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, dh), lambda g, i: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, dh), lambda g, i: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, dh), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda g, i: (g, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, nq, dh), q.dtype),
            jax.ShapeDtypeStruct((b * h, nq, 1), jnp.float32),
            jax.ShapeDtypeStruct((b * h, nq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(qh, kh, vh)
    out = out.reshape(b, h, nq, dh).transpose(0, 2, 1, 3).reshape(b, nq, d)
    return out, m[..., 0], l[..., 0]
