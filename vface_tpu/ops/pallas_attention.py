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

    Differentiable: the Pallas kernel has no reverse-mode rule, so a custom
    VJP recomputes the attention with the einsum path for the backward
    (forward values are numerically identical; training-time memory matches
    the plain path under remat)."""
    return _flash_v2_diff(q, k, v, num_heads, block_q, block_k, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_v2_diff(q, k, v, num_heads, block_q, block_k, interpret):
    return _flash_v2_impl(q, k, v, num_heads, block_q, block_k, interpret)


def _flash_v2_fwd(q, k, v, num_heads, block_q, block_k, interpret):
    return _flash_v2_impl(q, k, v, num_heads, block_q, block_k, interpret), (q, k, v)


def _flash_v2_bwd(num_heads, block_q, block_k, interpret, res, g):
    from vface_tpu.ops.attention import multi_head_attention

    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: multi_head_attention(q_, k_, v_, num_heads, dtype=q_.dtype),
        q, k, v,
    )
    return vjp(g)


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
# v3: transposed (dh-on-sublanes) layout for SD's narrow heads
# ---------------------------------------------------------------------------
#
# SD-1.4 attention has dh = 40. In the natural (N, dh) layout every VMEM tile
# pads the 40-wide lane dimension to 128 — 3.2x wasted bandwidth/footprint on
# q/k/v AND the accumulator. Holding everything transposed, (dh, N), puts dh
# on the 8-sublane dimension (40 = 5 full sublane groups, zero waste) and the
# large N on lanes:
#   s  (Bq, Bk) = dot(q_t, k_t, contract dim0·dim0)   — both operands (dh, N*)
#   o_t (dh, Bq) = dot(v_t, p,  contract dim1·dim1)   — p is (Bq, Bk)
# Softmax stays a lane-dimension reduction. The MXU contraction width for
# QK^T is still dh (hardware-bound at 40/128), but PV runs at full width and
# the VMEM traffic drops ~3x.


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
