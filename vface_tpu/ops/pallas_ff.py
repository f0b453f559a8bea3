"""Fused GEGLU FeedForward for the UNet transformer blocks.

Reference semantics: ``GEGLU`` + ``FeedForward`` in
`/root/reference/REFace/ldm/modules/attention.py:37-58` — ``proj`` to
2×inner, split, ``h * gelu(gate)`` (exact erf gelu), ``proj_out`` back to C.

Why a kernel: the XLA path is HBM-bound, not MXU-bound. At the ds1
operating shape (b=24, N=4096, C=320) the 5-layer FF stack costs 19 ms vs a
6.1 ms matmul floor (scripts/bench_ff_micro.py): the (M, 2·inner)
intermediate makes ~1.6 GB of HBM traffic per layer, and the fp32 erf
epilogue adds 6.5 ms on top. Fused, each M-tile stays in VMEM through
proj → gelu-gate → proj_out; HBM traffic drops to x + out + weights
(~130 MB/layer) and the erf runs on VMEM tiles under the matmul pipeline.

Numerics match the unfused path: both dots accumulate fp32 on the MXU and
round to the compute dtype (exactly what XLA's bf16 dot emits), the gate is
cast to fp32 for the erf gelu and back, as in
`vface_tpu/models/unet.py::GEGLU`. The backward recomputes through the
plain-XLA reference implementation (same memory profile as the unfused
path), so training is unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform.lower() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _ref_impl(x, wp, bp, wo, bo):
    """Plain-XLA reference: bit-compatible with GEGLU+Dense at dtype x.dtype."""
    h = jnp.dot(x, wp) + bp
    inner = wp.shape[1] // 2
    a, gate = h[..., :inner], h[..., inner:]
    hh = a * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(x.dtype)
    return jnp.dot(hh, wo) + bo


def _erf(x):
    """fp32 erf via Abramowitz–Stegun 7.1.26 (max abs error 1.5e-7).

    Mosaic has no erf/erfc lowering; 1.5e-7 absolute error in erf puts the
    gelu output within ~1e-7·|x| of exact — orders below the bf16 quantum
    the result is rounded to.
    """
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_erf(x32):
    return 0.5 * x32 * (1.0 + _erf(x32 * 0.7071067811865476))


def _ff_kernel(x_ref, wpa_ref, wpg_ref, bpa_ref, bpg_ref, wo_ref, bo_ref,
               o_ref, *, inner):
    """Split-projection GEGLU body: the GATE matmul runs first so its erf
    VPU epilogue can overlap the A matmul under Mosaic's scheduler, and the
    live fp32 intermediate is (tm, inner) instead of (tm, 2·inner).
    Bit-identical to the single-dot formulation: a dot's output columns are
    independent, so splitting wp column-wise changes nothing numerically
    (measured 3.86 → 3.43 ms/layer at ds1; scripts/bench_ff_tile.py)."""
    x = x_ref[...]
    g32 = jnp.dot(x, wpg_ref[...], preferred_element_type=jnp.float32)
    gate = g32.astype(x.dtype) + bpg_ref[...]
    g = _gelu_erf(gate.astype(jnp.float32)).astype(x.dtype)
    a32 = jnp.dot(x, wpa_ref[...], preferred_element_type=jnp.float32)
    a = a32.astype(x.dtype) + bpa_ref[...]
    o32 = jnp.dot(a * g, wo_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = o32.astype(x.dtype) + bo_ref[...]


def _pallas_impl(x2, wp, bp, wo, bo, interpret, tm=None):
    m, c = x2.shape
    two_i = wp.shape[1]
    inner = two_i // 2
    # Tile size per live shape (scripts/bench_ff_tile.py round-4 sweep on
    # the split kernel): ds1 (C=320) best at tm=256 (3.43 ms/layer), ds2
    # (C=640) best at tm=128 (2.71).
    tm = tm or (256 if c <= 320 else 128)
    wpa, wpg = wp[:, :inner], wp[:, inner:]
    bpa, bpg = bp[:inner].reshape(1, -1), bp[inner:].reshape(1, -1)
    pad = (-m) % tm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ff_kernel, inner=inner),
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
        interpret=interpret,
    )(x2, wpa, wpg, bpa, bpg, wo, bo.reshape(1, -1))
    return out[:m]


def _ff_kernel_wide(x_ref, wpa_ref, wpg_ref, bpa_ref, bpg_ref, wo_ref, bo_ref,
                    o_ref, acc_scr, *, n_ib):
    """Inner-blocked GEGLU body for WIDE sites (ds4: C=1280, 2·inner=10240 —
    the full weights cannot sit in VMEM). Grid (m_tiles, inner_blocks),
    sequential over inner blocks accumulating the second dot into an fp32
    scratch: per step only (C, ib)-sized weight slices are resident
    (~4 MB at ib=512). GEGLU is elementwise along inner, so blocking inner
    is exact; the output accumulation reassociates the contraction like any
    k-split dot (fp32 partial sums).

    MEASURED DEAD END at the only wide production site (ds4: M=6144,
    C=1280): 2.53 ms/layer at its best tiling (tm=256) vs 2.20 unfused —
    the small token count means per-m-tile weight re-streaming outweighs
    the saved intermediate round-trip (larger tm fails Mosaic compile).
    Kept (with its interpret-mode test) as the recorded experiment; wide
    sites route to the XLA path below."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    x = x_ref[...]
    g32 = jnp.dot(x, wpg_ref[...], preferred_element_type=jnp.float32)
    gate = g32.astype(x.dtype) + bpg_ref[...]
    g = _gelu_erf(gate.astype(jnp.float32)).astype(x.dtype)
    a32 = jnp.dot(x, wpa_ref[...], preferred_element_type=jnp.float32)
    a = a32.astype(x.dtype) + bpa_ref[...]
    acc_scr[...] += jnp.dot(a * g, wo_ref[...], preferred_element_type=jnp.float32)

    @pl.when(j == n_ib - 1)
    def _():
        o_ref[...] = acc_scr[...].astype(o_ref.dtype) + bo_ref[...]


def _pallas_impl_wide(x2, wp, bp, wo, bo, interpret, tm=128, ib=512):
    m, c = x2.shape
    two_i = wp.shape[1]
    inner = two_i // 2
    wpa, wpg = wp[:, :inner], wp[:, inner:]
    bpa, bpg = bp[:inner].reshape(1, -1), bp[inner:].reshape(1, -1)
    pad = (-m) % tm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    n_ib = inner // ib
    out = pl.pallas_call(
        functools.partial(_ff_kernel_wide, n_ib=n_ib),
        grid=(x2.shape[0] // tm, n_ib),
        in_specs=[
            pl.BlockSpec((tm, c), lambda i, j: (i, 0)),
            pl.BlockSpec((c, ib), lambda i, j: (0, j)),
            pl.BlockSpec((c, ib), lambda i, j: (0, j)),
            pl.BlockSpec((1, ib), lambda i, j: (0, j)),
            pl.BlockSpec((1, ib), lambda i, j: (0, j)),
            pl.BlockSpec((ib, c), lambda i, j: (j, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tm, c), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], c), x2.dtype),
        scratch_shapes=[pltpu.VMEM((tm, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x2, wpa, wpg, bpa, bpg, wo, bo.reshape(1, -1))
    return out[:m]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _geglu_ff(x2, wp, bp, wo, bo, interpret):
    return _pallas_impl(x2, wp, bp, wo, bo, interpret)


def _geglu_ff_fwd(x2, wp, bp, wo, bo, interpret):
    return _geglu_ff(x2, wp, bp, wo, bo, interpret), (x2, wp, bp, wo, bo)


def _geglu_ff_bwd(interpret, res, g):
    # recompute via the XLA reference path — same training memory as unfused
    _, vjp = jax.vjp(_ref_impl, *res)
    return vjp(g)


_geglu_ff.defvjp(_geglu_ff_fwd, _geglu_ff_bwd)


def geglu_ff(x, wp, bp, wo, bo, *, interpret: bool = False):
    """``proj_out((proj(x)[:, :i]) * gelu(proj(x)[:, i:]))`` fused in VMEM.

    x: (..., C); wp: (C, 2·inner); bp: (2·inner,); wo: (inner, C); bo: (C,).
    All operands should already be in the compute dtype. Falls back to the
    identical plain-XLA computation off-TPU.
    """
    if not (interpret or _on_tpu()):
        return _ref_impl(x, wp, bp, wo, bo)
    if x.shape[-1] > 768 and not interpret:
        # Wide sites (ds4: C=1280): the resident-weight kernel cannot fit
        # VMEM and the inner-blocked variant (_pallas_impl_wide) measured
        # SLOWER than XLA at the small ds4 token count (2.53 vs 2.20
        # ms/layer — see its docstring). XLA keeps these sites.
        return _ref_impl(x, wp, bp, wo, bo)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    out = _geglu_ff(x2, wp, bp, wo, bo, interpret)
    return out.reshape(*lead, out.shape[-1])
