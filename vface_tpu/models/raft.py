"""RAFT-large optical flow in Flax — the FGATS flow source.

Capability parity with the reference's flow stage, which loads torchvision's
``raft_large`` and runs 20 iterations per consecutive-frame pair at 512²
(`/root/reference/REFace/scripts/temporal_flow.py:27-37,164-188`). Rebuilt
TPU-first:

* all frame pairs of a window are batched into one forward (the reference
  loops pairs one at a time);
* the recurrent update is a ``lax.scan`` over a static iteration count;
* the all-pairs correlation volume is one einsum (MXU) and pyramid lookups
  are batched bilinear gathers (`vface_tpu.ops.warp.grid_sample`).

Architecture follows the RAFT paper (Teed & Deng, ECCV 2020) / torchvision
``raft_large``: instance-norm feature encoder → 256-d features at 1/8,
batch-norm context encoder → 128 hidden (tanh) + 128 context (relu), 4-level
correlation pyramid with radius-4 lookups (324 corr channels), SepConvGRU
update with convex-upsampling mask head. Weight names map 1:1 from the
torchvision checkpoint via ``vface_tpu.utils.torch_convert``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vface_tpu.ops.warp import grid_sample


class InstanceNorm(nn.Module):
    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return y * scale + bias


class ResidualUnit(nn.Module):
    ch: int
    stride: int = 1
    norm: str = "instance"

    def _norm(self, name):
        if self.norm == "instance":
            return InstanceNorm(name=name)
        if self.norm == "batch":
            # frozen-statistics BN (inference; flow net is always frozen here)
            from vface_tpu.models.arcface import FrozenBN

            return FrozenBN(name=name)
        return lambda x: x  # 'none'

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), strides=(self.stride,) * 2, padding=1, param_dtype=jnp.float32, name="conv1")(x)
        h = jax.nn.relu(self._norm("norm1")(h))
        h = nn.Conv(self.ch, (3, 3), padding=1, param_dtype=jnp.float32, name="conv2")(h)
        h = jax.nn.relu(self._norm("norm2")(h))
        if self.stride != 1 or x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), strides=(self.stride,) * 2, param_dtype=jnp.float32, name="downsample")(x)
            x = self._norm("norm3")(x)
        return jax.nn.relu(x + h)


class RAFTEncoder(nn.Module):
    out_ch: int = 256
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, param_dtype=jnp.float32, name="conv1")(x)
        if self.norm == "instance":
            h = InstanceNorm(name="norm1")(h)
        elif self.norm == "batch":
            from vface_tpu.models.arcface import FrozenBN

            h = FrozenBN(name="norm1")(h)
        h = jax.nn.relu(h)
        for i, (ch, stride) in enumerate([(64, 1), (64, 1), (96, 2), (96, 1), (128, 2), (128, 1)]):
            h = ResidualUnit(ch, stride, norm=self.norm, name=f"layer_{i}")(h)
        return nn.Conv(self.out_ch, (1, 1), param_dtype=jnp.float32, name="conv2")(h)


def correlation_pyramid(f1: jax.Array, f2: jax.Array, levels: int = 4):
    """All-pairs correlation: f1,f2 (B,H,W,C) → [(B,H,W,H/2^l,W/2^l)] per level."""
    b, h, w, c = f1.shape
    corr = jnp.einsum("bijc,bklc->bijkl", f1, f2, preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.float32(c))
    pyramid = [corr]
    cur = corr.reshape(b * h * w, h, w, 1)
    for _ in range(levels - 1):
        if min(cur.shape[1], cur.shape[2]) >= 2:
            cur = nn.avg_pool(cur, (2, 2), strides=(2, 2))
        # else: tiny test inputs — keep the 1×1 level instead of pooling to 0
        hh, ww = cur.shape[1], cur.shape[2]
        pyramid.append(cur.reshape(b, h, w, hh, ww))
    return pyramid


def lookup_corr(pyramid, coords: jax.Array, radius: int = 4):
    """Sample each level of the pyramid in a (2r+1)² window around coords.

    coords (B,H,W,2) in level-0 pixel units (x, y). Returns
    (B,H,W,levels*(2r+1)²) feature map, K ordered dy-major (the torchvision
    window order pinned in tests/test_raft_oracle.py).

    TPU formulation — NO gathers. Bilinear sampling is a linear map of the
    source row/column axes, so the whole (2r+1)² window is two tiny batched
    matmuls against dense triangle-kernel weight matrices:

        wy[n, a, Y] = max(0, 1 − |(cy + dy_a) − Y|)
        win[n, a, b] = Σ_{Y,X} wy[n,a,Y] · corr[n,Y,X] · wx[n,b,X]

    Coordinates are deliberately NOT clamped: an out-of-range tap gets zero
    triangle weight against every in-range texel, which reproduces
    ``F.grid_sample``'s default ZERO padding exactly — the mode torchvision's
    CorrBlock uses for its pyramid lookup (it never sets ``padding_mode``;
    only the frame warp at `temporal_flow.py:52` uses 'border'). Gather-based
    versions measured 6.7 s (per-element) / 3.7 s (patch dynamic_slice) per
    window on v5e; this dense form is pure VPU + MXU.
    """
    b, h, w, _ = coords.shape
    r = radius
    k = 2 * r + 1
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)  # dy-major window
    out = []
    n = b * h * w
    for lvl, corr in enumerate(pyramid):
        hh, ww = corr.shape[3], corr.shape[4]
        c = corr.reshape(n, hh, ww)
        ctr = coords.reshape(n, 2) / (2.0**lvl)  # (x, y)
        sy = ctr[:, 1:2] + d[None, :]  # (n, k); unclipped → zero padding
        sx = ctr[:, 0:1] + d[None, :]
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy[:, :, None] - jnp.arange(hh, dtype=jnp.float32)))
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx[:, :, None] - jnp.arange(ww, dtype=jnp.float32)))
        tmp = jnp.einsum("nah,nhw->naw", wy, c, preferred_element_type=jnp.float32)
        win = jnp.einsum("naw,nbw->nab", tmp, wx, preferred_element_type=jnp.float32)
        out.append(win.reshape(b, h, w, k * k))
    return jnp.concatenate(out, axis=-1)


class MotionEncoder(nn.Module):
    @nn.compact
    def __call__(self, flow, corr):
        c = nn.Conv(256, (1, 1), param_dtype=jnp.float32, name="convc1")(corr)
        c = jax.nn.relu(c)
        c = nn.Conv(192, (3, 3), padding=1, param_dtype=jnp.float32, name="convc2")(c)
        c = jax.nn.relu(c)
        f = nn.Conv(128, (7, 7), padding=3, param_dtype=jnp.float32, name="convf1")(flow)
        f = jax.nn.relu(f)
        f = nn.Conv(64, (3, 3), padding=1, param_dtype=jnp.float32, name="convf2")(f)
        f = jax.nn.relu(f)
        h = nn.Conv(126, (3, 3), padding=1, param_dtype=jnp.float32, name="conv")(
            jnp.concatenate([c, f], axis=-1)
        )
        h = jax.nn.relu(h)
        return jnp.concatenate([h, flow], axis=-1)  # 128


class SepConvGRU(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, h, x):
        def gru(h, x, ks, name):
            hx = jnp.concatenate([h, x], axis=-1)
            pad = (ks[0] // 2, ks[1] // 2)
            z = jax.nn.sigmoid(nn.Conv(self.hidden, ks, padding=pad, param_dtype=jnp.float32, name=f"{name}_z")(hx))
            r = jax.nn.sigmoid(nn.Conv(self.hidden, ks, padding=pad, param_dtype=jnp.float32, name=f"{name}_r")(hx))
            q = jnp.tanh(
                nn.Conv(self.hidden, ks, padding=pad, param_dtype=jnp.float32, name=f"{name}_q")(
                    jnp.concatenate([r * h, x], axis=-1)
                )
            )
            return (1 - z) * h + z * q

        h = gru(h, x, (1, 5), "horiz")
        h = gru(h, x, (5, 1), "vert")
        return h


class UpdateBlock(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, h, context, corr, flow):
        m = MotionEncoder(name="motion")(flow, corr)
        x = jnp.concatenate([context, m], axis=-1)
        h = SepConvGRU(self.hidden, name="gru")(h, x)
        f = nn.Conv(256, (3, 3), padding=1, param_dtype=jnp.float32, name="flow_head1")(h)
        delta = nn.Conv(2, (3, 3), padding=1, param_dtype=jnp.float32, name="flow_head2")(jax.nn.relu(f))
        mk = nn.Conv(256, (3, 3), padding=1, param_dtype=jnp.float32, name="mask1")(h)
        mask = nn.Conv(64 * 9, (1, 1), param_dtype=jnp.float32, name="mask2")(jax.nn.relu(mk)) * 0.25
        return h, delta, mask


def convex_upsample(flow: jax.Array, mask: jax.Array) -> jax.Array:
    """8x convex-combination upsampling (RAFT paper §3.3). flow (B,h,w,2)."""
    b, h, w, _ = flow.shape
    mask = mask.reshape(b, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)
    # 3x3 neighborhoods of the (scaled) coarse flow
    pads = [(1, 1), (1, 1)]
    fp = jnp.pad(flow * 8.0, ((0, 0), *pads, (0, 0)))
    patches = jnp.stack(
        [fp[:, i : i + h, j : j + w, :] for i in range(3) for j in range(3)], axis=3
    )  # (B,h,w,9,2)
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", mask, patches)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(b, 8 * h, 8 * w, 2)


@dataclasses.dataclass(frozen=True)
class RAFTConfig:
    iters: int = 20
    corr_levels: int = 4
    corr_radius: int = 4


class RAFT(nn.Module):
    """raft_large. Input frames in [-1, 1], NHWC, H/W divisible by 8.

    ``__call__(img1, img2)`` → flow (B, H, W, 2) in pixels (dx, dy).
    """

    cfg: RAFTConfig = RAFTConfig()

    @nn.compact
    def __call__(self, img1, img2):
        cfg = self.cfg
        b, hh, ww, _ = img1.shape
        h8, w8 = hh // 8, ww // 8
        fmaps = RAFTEncoder(256, norm="instance", name="fnet")(
            jnp.concatenate([img1, img2], axis=0)
        )
        f1, f2 = jnp.split(fmaps, 2, axis=0)
        pyramid = correlation_pyramid(f1, f2, cfg.corr_levels)
        cnet = RAFTEncoder(256, norm="batch", name="cnet")(img1)
        hidden = jnp.tanh(cnet[..., :128])
        context = jax.nn.relu(cnet[..., 128:])

        ys, xs = jnp.meshgrid(
            jnp.arange(h8, dtype=jnp.float32), jnp.arange(w8, dtype=jnp.float32), indexing="ij"
        )
        base = jnp.stack([xs, ys], axis=-1)[None]
        base = jnp.broadcast_to(base, (b, h8, w8, 2))

        update = UpdateBlock(name="update")

        # Weight-shared refinement loop. A Python loop here shares the module
        # params across iterations and lets XLA pipeline the unrolled steps;
        # `iters` is static (20, temporal_flow.py:36).
        hid = hidden
        flow = jnp.zeros((b, h8, w8, 2), jnp.float32)
        mask = jnp.zeros((b, h8, w8, 64 * 9), jnp.float32)
        for _ in range(cfg.iters):
            corr = lookup_corr(pyramid, base + flow, cfg.corr_radius)
            hid, delta, mask = update(hid, context, corr, flow)
            flow = flow + delta

        return convex_upsample(flow, mask)
