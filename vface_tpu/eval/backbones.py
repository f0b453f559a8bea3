"""Shared eval backbones: torchvision-style ResNet-50 (frozen BN), Flax/NHWC.

Used by the pose metric (Hopenet is ResNet-50 + three 66-bin heads,
`/root/reference/REFace/eval_tool/face_vid2vid/modules/hopenet.py`) and the
expression metric (Deep3DFaceRecon's ``net_recon`` is ResNet-50 → 257 coeffs,
`eval_tool/Deep3DFaceRecon_pytorch_edit/models/networks.py`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vface_tpu.models.arcface import FrozenBN


class Bottleneck(nn.Module):
    ch: int  # bottleneck width; output is ch * 4
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        out_ch = self.ch * 4
        h = nn.Conv(self.ch, (1, 1), use_bias=False, param_dtype=jnp.float32, name="conv1")(x)
        h = jax.nn.relu(FrozenBN(name="bn1")(h))
        h = nn.Conv(self.ch, (3, 3), strides=(self.stride,) * 2, padding=1, use_bias=False,
                    param_dtype=jnp.float32, name="conv2")(h)
        h = jax.nn.relu(FrozenBN(name="bn2")(h))
        h = nn.Conv(out_ch, (1, 1), use_bias=False, param_dtype=jnp.float32, name="conv3")(h)
        h = FrozenBN(name="bn3")(h)
        if self.stride != 1 or x.shape[-1] != out_ch:
            x = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2, use_bias=False,
                        param_dtype=jnp.float32, name="down_conv")(x)
            x = FrozenBN(name="down_bn")(x)
        return jax.nn.relu(x + h)


class ResNet50(nn.Module):
    """Returns the 2048-d global-average-pooled feature."""

    layers: Tuple[int, ...] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    param_dtype=jnp.float32, name="conv1")(x)
        h = jax.nn.relu(FrozenBN(name="bn1")(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (blocks, ch) in enumerate(zip(self.layers, (64, 128, 256, 512))):
            for b in range(blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                h = Bottleneck(ch, stride, name=f"layer{stage + 1}_{b}")(h)
        return jnp.mean(h, axis=(1, 2))
