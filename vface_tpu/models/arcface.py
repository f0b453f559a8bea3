"""ArcFace IR-SE-50 face-recognition backbone, in Flax (frozen, inference BN).

Capability parity with `/root/reference/REFace/src/Face_models/encoders/
model_irse.py:9-105` + `helpers.py` (bottleneck_IR_SE / SEModule): the 112x112
IR-SE-50 whose 512-d embedding the reference uses for

* the ID term of the conditioning token (`ddpm.py:872-1045`),
* the masked ID loss of `p_losses_face` (`ddpm.py:1761-1773`),
* the ID-retrieval eval metric (`eval_tool/ID_retrieval/ID_retrieval.py:104`).

Stage plan (ir-50): depths (64,128,256,512) x units (3,4,14,3), stride 2 at
each stage entry; SE excitation ratio 16; output head = BN → flatten →
Linear(512*7*7, 512) → BN (affine). BatchNorm always runs with frozen
running stats (the net is frozen in every use).
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

IR_50_STAGES: Tuple[Tuple[int, int], ...] = ((64, 3), (128, 4), (256, 14), (512, 3))


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(C) semantics)."""

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],))
        a = a.astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


class FrozenBN(nn.Module):
    """BatchNorm with frozen running stats (scale/bias/mean/var as params)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(x.dtype)


class SEModule(nn.Module):
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(c // self.reduction, (1, 1), use_bias=False, param_dtype=jnp.float32, name="fc1")(s)
        s = jax.nn.relu(s)
        s = nn.Conv(c, (1, 1), use_bias=False, param_dtype=jnp.float32, name="fc2")(s)
        return x * jax.nn.sigmoid(s.astype(jnp.float32)).astype(x.dtype)


class BottleneckIRSE(nn.Module):
    depth: int
    stride: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        if in_ch == self.depth:
            # reference shortcut is MaxPool2d(kernel=1, stride) even when
            # strided (helpers.py:100-101) — a pure subsample, NOT a conv
            shortcut = x if self.stride == 1 else x[:, :: self.stride, :: self.stride, :]
        else:
            shortcut = nn.Conv(
                self.depth, (1, 1), strides=(self.stride, self.stride), use_bias=False,
                param_dtype=jnp.float32, name="shortcut_conv",
            )(x)
            shortcut = FrozenBN(name="shortcut_bn")(shortcut)
        h = FrozenBN(name="bn1")(x)
        h = nn.Conv(self.depth, (3, 3), padding=1, use_bias=False, param_dtype=jnp.float32, name="conv1")(h)
        h = PReLU(name="prelu")(h)
        h = nn.Conv(
            self.depth, (3, 3), strides=(self.stride, self.stride), padding=1, use_bias=False,
            param_dtype=jnp.float32, name="conv2",
        )(h)
        h = FrozenBN(name="bn2")(h)
        h = SEModule(name="se")(h)
        return h + shortcut


class IRSE50(nn.Module):
    """Returns the l2-normalisable 512-d embedding; optionally multi-scale features.

    Input: (B, 112, 112, 3) in [-1, 1] (ArcFace convention).
    ``stages`` defaults to the real ir-50 plan; tiny test configs may shrink it.
    """

    stages: Tuple[Tuple[int, int], ...] = IR_50_STAGES
    embed_dim: int = 512

    @nn.compact
    def __call__(self, x, return_scales: bool = False):
        h = nn.Conv(64, (3, 3), padding=1, use_bias=False, param_dtype=jnp.float32, name="input_conv")(x)
        h = FrozenBN(name="input_bn")(h)
        h = PReLU(name="input_prelu")(h)
        scales: List[jax.Array] = []
        idx = 0
        for depth, units in self.stages:
            for u in range(units):
                stride = 2 if u == 0 else 1
                h = BottleneckIRSE(depth, stride, name=f"block_{idx}")(h)
                idx += 1
            scales.append(h)
        h = FrozenBN(name="out_bn")(h)
        b = h.shape[0]
        h = h.transpose(0, 3, 1, 2).reshape(b, -1)  # torch flatten order (C,H,W)
        h = nn.Dense(self.embed_dim, param_dtype=jnp.float32, name="out_fc")(h)
        h = FrozenBN1D(name="out_feat_bn")(h)
        if return_scales:
            return h, scales
        return h


class FrozenBN1D(nn.Module):
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + self.epsilon) * scale
        return ((x.astype(jnp.float32) - mean) * inv + bias).astype(x.dtype)


def arcface_preprocess(images01: jax.Array) -> jax.Array:
    """(B, H, W, 3) in [0,1] → the reference IDLoss input chain
    (ddpm.py:112-119): adaptive-avg-pool to 256² (skipped when the input is
    already 256, matching ``x.shape[2]!=256`` at :117), centre crop rows
    35:223 / cols 32:220, adaptive-avg-pool to 112², scaled to [-1, 1].
    ``adaptive_avg_pool`` reproduces ``F.adaptive_avg_pool2d`` exactly (box
    windows when downsampling, nearest-repeat when upsampling) — the reference
    never bilinearly resizes here."""
    from vface_tpu.ops.pooling import adaptive_avg_pool

    x = images01
    if x.shape[1] != 256 or x.shape[2] != 256:
        x = adaptive_avg_pool(x, 256, 256)
    x = x[:, 35:223, 32:220, :]
    x = adaptive_avg_pool(x, 112, 112)
    return x * 2.0 - 1.0


def safe_l2_normalize(x: jax.Array, eps: float = 1e-12) -> jax.Array:
    """torch ``F.normalize`` semantics: x / max(||x||, eps) along the last axis.

    Unlike ``x / (linalg.norm(x) + eps)``, the gradient is finite at x == 0
    (``linalg.norm``'s VJP is 0/0 = NaN there; the clamped-sum form kills the
    sqrt branch entirely when the norm is in the clamp region). At realistic
    embedding norms the two forms agree to fp32 precision.
    """
    n2 = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(n2, eps * eps))


def id_embedding(params, images01: jax.Array, model: IRSE50 | None = None) -> jax.Array:
    """L2-normalised 512-d ID embedding from [0,1] images."""
    model = model or IRSE50()
    feats = model.apply({"params": params}, arcface_preprocess(images01))
    return safe_l2_normalize(feats)


def id_loss(feats_a: jax.Array, feats_b: jax.Array) -> jax.Array:
    """1 - cosine similarity, averaged (ddpm.py:120-158 semantics)."""
    a = safe_l2_normalize(feats_a)
    b = safe_l2_normalize(feats_b)
    return jnp.mean(1.0 - jnp.sum(a * b, axis=-1))
