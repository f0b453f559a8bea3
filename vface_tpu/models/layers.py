"""Shared Flax building blocks for the vface_tpu model zoo.

TPU-first conventions used by every model in this package:

* **NHWC layout** everywhere (XLA:TPU's native convolution layout; the
  reference is NCHW torch — e.g. `/root/reference/REFace/ldm/modules/
  diffusionmodules/model.py`).
* **Params in float32, compute in a configurable dtype** (bfloat16 on TPU).
  Normalisations and softmax always reduce in float32.
* Convs/matmuls declare ``preferred_element_type`` implicitly through the
  module ``dtype``; XLA tiles them onto the MXU.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Dtype = Any


def nonlinearity(x):
    """SiLU / swish (reference model.py:43-45)."""
    return jax.nn.silu(x)


class _GNParams(nn.Module):
    """Parameter holder keeping the ``<parent>/GroupNorm_0/{scale,bias}``
    tree path the torch converters write to (utils/torch_convert.py:71)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


def _gn_sums_kernel(x_ref, s1_ref, s2_ref):
    j = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)  # (B, Hc, W, C)
    p1 = jnp.sum(x, axis=(1, 2))
    p2 = jnp.sum(x * x, axis=(1, 2))

    @pl.when(j == 0)
    def _():
        s1_ref[...] = p1
        s2_ref[...] = p2

    @pl.when(j != 0)
    def _():
        s1_ref[...] += p1
        s2_ref[...] += p2


# block budget: the kernel's fp32 temporaries (cast + square) triple the
# bf16 block in VMEM stack, and the default scoped-vmem limit is 16 MB.
# 4 MB blocks left no margin: the VAE shapes landed at ~14 MB of stack but
# the UNet in_norm at (24, 64, 64, 320) hit 18.16 MB — a real-chip scoped
# OOM inside the super-pack program (hc halving quantises the block size,
# so the stack varies with shape). 2 MB blocks bound the stack at ~10 MB
# for every eligible shape; the kernel is bandwidth-bound and 2 MB still
# amortises the grid overhead.
_GN_BLOCK_BUDGET = 2 * 1024 * 1024


def _gn_block_rows(b: int, h: int, w: int, c: int, itemsize: int,
                   budget: int = _GN_BLOCK_BUDGET) -> int:
    """Rows per input block: halve H until the block fits the VMEM budget.

    Shared by the kernel launch and the eligibility gate so the two cannot
    drift (ADVICE r3). The loop exits with hc odd when H's power-of-two part
    is exhausted — callers must check the resulting block size again; a shape
    whose odd remainder is still over budget is NOT eligible (at a ~6x
    block→VMEM-stack ratio, anything much over the budget busts the 16 MB
    scoped-VMEM limit — the class of failure behind the round-3 real-chip
    OOM)."""
    hc = h
    while b * hc * w * c * itemsize > budget and hc % 2 == 0:
        hc //= 2
    return hc


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform.lower() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _gn_sums_pallas(x, interpret: bool = False, block_budget: int = None):
    """(B, H, W, C) → (sum, sum-of-squares) over (H, W), fp32, one pass.

    XLA's spatial reduce is pathological at VAE shapes — measured 10.3 ms per
    GroupNorm site at (6, 512, 512, 128) against a ~1.5 ms bandwidth floor,
    167 ms of the 315 ms VAE decode (scripts/bench_gn_micro.py /
    bench_vae_ablate.py). This kernel streams row blocks through VMEM once,
    accumulating both sums in a resident (B, C) fp32 block. The (B, C)
    output block is the whole array, which satisfies the Mosaic tiling rule
    for any B/C; the input block keeps full W and C for the same reason.
    """
    b, h, w, c = x.shape
    budget = block_budget or _GN_BLOCK_BUDGET
    hc = _gn_block_rows(b, h, w, c, x.dtype.itemsize, budget)
    if b * hc * w * c * x.dtype.itemsize > budget:
        # Defensive: odd-H remainder still over budget (the gate should have
        # rejected this shape). XLA fallback instead of risking scoped-VMEM.
        x32 = x.astype(jnp.float32)
        return jnp.sum(x32, axis=(1, 2)), jnp.sum(x32 * x32, axis=(1, 2))
    return pl.pallas_call(
        _gn_sums_kernel,
        grid=(h // hc,),
        interpret=interpret,
        in_specs=[pl.BlockSpec((b, hc, w, c), lambda j: (0, j, 0, 0))],
        out_specs=[
            pl.BlockSpec((b, c), lambda j: (0, 0)),
            pl.BlockSpec((b, c), lambda j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c), jnp.float32),
            jax.ShapeDtypeStruct((b, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: accumulates
        ),
    )(x)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _gn_sums(x, interpret: bool = False):
    return _gn_sums_pallas(x, interpret)


def _gn_sums_fwd(x, interpret):
    return _gn_sums_pallas(x, interpret), x


def _gn_sums_bwd(interpret, x, g):
    ds1, ds2 = g
    dx = ds1[:, None, None, :] + 2.0 * x.astype(jnp.float32) * ds2[:, None, None, :]
    return (dx.astype(x.dtype),)


_gn_sums.defvjp(_gn_sums_fwd, _gn_sums_bwd)


def _gn_pallas_eligible(x) -> bool:
    if x.ndim != 4:
        return False
    b, h, w, c = x.shape
    if h * w * b * c < (1 << 21):  # small activations: XLA reduce is fine
        return False
    if h * w < (1 << 14):
        # XLA's spatial-reduce pathology is a BIG-spatial phenomenon (measured
        # 10.3 ms/site at 512², ~7× the bandwidth floor — bench_gn_micro.py);
        # at the UNet's ≤64² maps XLA reduces fine (conv/GN backbone measured
        # 87% MXU, bench_unet_ablate.py) and the kernel is unmeasured there —
        # it also put an 18 MB stack on the scoped VMEM limit at b=24 (the
        # real-chip super-pack OOM). Keep the kernel where it was measured to
        # win: the VAE's 128²…512² stages.
        return False
    hc = _gn_block_rows(b, h, w, c, x.dtype.itemsize)
    if b * hc * w * c * x.dtype.itemsize > _GN_BLOCK_BUDGET:
        # Odd-H remainder still over budget: the ~6x block→stack ratio means
        # any block much past the budget busts the 16 MB scoped-VMEM limit
        # (ADVICE r3 — e.g. (12, 512, 512, 256) bf16 lands at hc=1 / 3 MB,
        # an 18 MB-class stack). Fall back to the XLA reduce.
        return False
    return _on_tpu()


class GroupNorm32(nn.Module):
    """GroupNorm(32) with float32 statistics regardless of compute dtype.

    Matches torch ``GroupNorm(32, C)`` (UNet, eps 1e-5) and the VAE's
    ``Normalize`` (eps 1e-6) — pick via ``epsilon``.

    Hand-rolled instead of ``nn.GroupNorm`` for TPU memory traffic: casting
    the activation to fp32 before a library GN materialises an fp32 copy and
    runs multiple fp32 passes — measured 166 ms of the 319 ms VAE decode at
    512² (scripts/bench_vae_ablate.py). Written this way, XLA fuses the cast
    into one bf16-read reduction pass (fp32 accumulation) and one bf16-in/
    bf16-out multiply-add apply pass: y = x * a_c + b_c with per-channel
    a = inv_std*scale, b = bias - mean*inv_std*scale folded from the group
    statistics. Same math as flax's fast-variance GN (E[x²] − E[x]², fp32),
    reassociation-level differences only.
    """

    epsilon: float = 1e-5
    num_groups: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        c = x.shape[-1]
        g = min(self.num_groups, c)
        cg = c // g
        scale, bias = _GNParams(c, name="GroupNorm_0")()
        red_axes = tuple(range(1, x.ndim - 1))
        x32 = x.astype(jnp.float32)
        if _gn_pallas_eligible(x):
            # single-pass Pallas stats (see _gn_sums_pallas) — XLA's reduce
            # costs ~7x bandwidth at the VAE's big-spatial shapes
            s1, s2 = _gn_sums(x)
        else:
            s1 = jnp.sum(x32, axis=red_axes)        # (B, C); cast fuses into reduce
            s2 = jnp.sum(x32 * x32, axis=red_axes)  # same input pass (multi-output fusion)
        b = s1.shape[0]
        count = cg
        for a in red_axes:
            count *= x.shape[a]
        g1 = jnp.sum(s1.reshape(b, g, cg), axis=-1) / count  # (B, G) mean
        g2 = jnp.sum(s2.reshape(b, g, cg), axis=-1) / count  # (B, G) E[x²]
        inv = jax.lax.rsqrt(g2 - g1 * g1 + self.epsilon)     # (B, G)
        mean_c = jnp.broadcast_to(g1[..., None], (b, g, cg)).reshape(b, c)
        inv_c = jnp.broadcast_to(inv[..., None], (b, g, cg)).reshape(b, c)
        a_c = inv_c * scale[None]
        b_c = bias[None] - mean_c * a_c
        shape = (b,) + (1,) * (x.ndim - 2) + (c,)
        y = x32 * a_c.reshape(shape) + b_c.reshape(shape)
        return y.astype(orig)


class Conv(nn.Module):
    """3x3/1x1 conv, NHWC, optional zero-init (the reference's zero_module).

    Default padding is TORCH semantics — symmetric (k-1)//2 on both sides,
    like ``torch.nn.Conv2d(padding=k//2)``. This matters for stride-2 convs:
    XLA/flax ``"SAME"`` pads (0, 1) there, sampling a grid shifted by one
    pixel vs the reference (caught by tests/test_reference_parity.py).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: Any = "TORCH"
    zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        pad = self.padding
        if pad == "TORCH":
            p = (self.kernel - 1) // 2
            pad = ((p, p), (p, p))
        return nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=pad,
            kernel_init=init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class Dense(nn.Module):
    features: int
    zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        return nn.Dense(
            self.features, kernel_init=init, dtype=self.dtype, param_dtype=jnp.float32
        )(x)


class _LNParams(nn.Module):
    """Parameter holder keeping ``nn.LayerNorm``'s ``LayerNorm_0/{scale,bias}``
    tree path (and init) so converters and checkpoints are unaffected."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


class LayerNormF32(nn.Module):
    """LayerNorm reducing in float32.

    Hand-rolled for the same reason as :class:`GroupNorm32`: casting to fp32
    and calling the library LayerNorm materialises an fp32 activation copy;
    written as explicit per-token statistics + one multiply-add, XLA fuses
    the cast into the reduction pass and keeps the apply pass bf16-in/
    bf16-out. Same fast-variance math (E[x²] − E[x]², fp32 accumulation) as
    ``nn.LayerNorm`` — reassociation-level differences only.
    """

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        scale, bias = _LNParams(x.shape[-1], name="LayerNorm_0")()
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        m2 = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(m2 - mu * mu + self.epsilon)
        y = (x32 - mu) * inv * scale + bias
        return y.astype(orig)


def upsample_nearest_2x(x):
    """Nearest-neighbour 2x upsample, NHWC (reference model.py:60: F.interpolate x2)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def avg_pool_2x(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class SelfAttention2D(nn.Module):
    """Single-head full self-attention over H*W (VAE AttnBlock, model.py:141-184)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = GroupNorm32(epsilon=1e-6, dtype=self.dtype)(x)
        q = Conv(c, kernel=1, dtype=self.dtype, name="q")(hidden).reshape(b, h * w, c)
        k = Conv(c, kernel=1, dtype=self.dtype, name="k")(hidden).reshape(b, h * w, c)
        v = Conv(c, kernel=1, dtype=self.dtype, name="v")(hidden).reshape(b, h * w, c)
        sim = jnp.einsum("bic,bjc->bij", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(sim * (c ** -0.5), axis=-1).astype(self.dtype)
        out = jnp.einsum("bij,bjc->bic", attn, v, preferred_element_type=jnp.float32)
        out = out.astype(self.dtype).reshape(b, h, w, c)
        out = Conv(c, kernel=1, dtype=self.dtype, name="proj_out")(out)
        return x + out
