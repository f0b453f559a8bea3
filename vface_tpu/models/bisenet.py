"""BiSeNet face parser (ResNet-18 backbone, 19 CelebAMask-HQ classes), Flax.

Capability parity with `/root/reference/REFace/pretrained/face_parsing/model.py`
(``BiSeNet`` :236, ``Resnet18`` resnet.py:58) used by
``faceParsing_demo``/``FaceParser`` (face_parsing_demo.py:288-318) to produce
the 512² segmentation masks that drive the inpaint regions. Rebuilt NHWC,
frozen-BN (the parser is always frozen), fully batched — the reference runs it
frame-at-a-time on host-driven tensors (hot CPU loop #1, SURVEY §3.1); here a
whole frame window is one jitted call.

Structure: ResNet-18 trunk (feat8/feat16/feat32) → ContextPath with two
attention-refinement modules + global context → FeatureFusionModule →
19-class head at 1/8 resolution, bilinearly upsampled to input size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from vface_tpu.models.arcface import FrozenBN

N_PARSING_CLASSES = 19


class ConvBNReLU(nn.Module):
    ch: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.ch, (self.kernel, self.kernel), strides=(self.stride,) * 2,
            padding=self.kernel // 2, use_bias=False, param_dtype=jnp.float32, name="conv",
        )(x)
        return jax.nn.relu(FrozenBN(name="bn")(x))


class BasicBlock(nn.Module):
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), strides=(self.stride,) * 2, padding=1, use_bias=False,
                    param_dtype=jnp.float32, name="conv1")(x)
        h = jax.nn.relu(FrozenBN(name="bn1")(h))
        h = nn.Conv(self.ch, (3, 3), padding=1, use_bias=False, param_dtype=jnp.float32, name="conv2")(h)
        h = FrozenBN(name="bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1), strides=(self.stride,) * 2, use_bias=False,
                        param_dtype=jnp.float32, name="down_conv")(x)
            x = FrozenBN(name="down_bn")(x)
        return jax.nn.relu(x + h)


class ResNet18Trunk(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    param_dtype=jnp.float32, name="conv1")(x)
        h = jax.nn.relu(FrozenBN(name="bn1")(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i in range(2):
            h = BasicBlock(64, name=f"layer1_{i}")(h)
        for i in range(2):
            h = BasicBlock(128, stride=2 if i == 0 else 1, name=f"layer2_{i}")(h)
        feat8 = h
        for i in range(2):
            h = BasicBlock(256, stride=2 if i == 0 else 1, name=f"layer3_{i}")(h)
        feat16 = h
        for i in range(2):
            h = BasicBlock(512, stride=2 if i == 0 else 1, name=f"layer4_{i}")(h)
        return feat8, feat16, h


class AttentionRefinement(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        feat = ConvBNReLU(self.ch, 3, name="conv")(x)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.ch, (1, 1), use_bias=False, param_dtype=jnp.float32, name="conv_atten")(atten)
        atten = jax.nn.sigmoid(FrozenBN(name="bn_atten")(atten).astype(jnp.float32)).astype(feat.dtype)
        return feat * atten


def _resize_nearest(x, h, w):
    """Context-path upsample: F.interpolate(mode='nearest') (model.py:123, 128)."""
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), method="nearest")


def _resize_bilinear_align_corners(x, h, w):
    """Bilinear with align_corners=True — the reference's final logits
    upsample (model.py:258). jax.image.resize is half-pixel (align_corners
    =False), so the corner-aligned grid is gathered explicitly."""
    b, ih, iw, c = x.shape
    if (ih, iw) == (h, w):
        return x
    ys = jnp.linspace(0.0, ih - 1.0, h) if h > 1 else jnp.zeros((1,))
    xs = jnp.linspace(0.0, iw - 1.0, w) if w > 1 else jnp.zeros((1,))
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, ih - 1)
    x1 = jnp.minimum(x0 + 1, iw - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    r0 = x[:, y0]
    r1 = x[:, y1]
    top = r0[:, :, x0] * (1 - wx) + r0[:, :, x1] * wx
    bot = r1[:, :, x0] * (1 - wx) + r1[:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class ContextPath(nn.Module):
    @nn.compact
    def __call__(self, x):
        feat8, feat16, feat32 = ResNet18Trunk(name="resnet")(x)
        h8, w8 = feat8.shape[1], feat8.shape[2]
        h16, w16 = feat16.shape[1], feat16.shape[2]
        h32, w32 = feat32.shape[1], feat32.shape[2]

        avg = jnp.mean(feat32, axis=(1, 2), keepdims=True)
        avg = ConvBNReLU(128, 1, name="conv_avg")(avg)
        avg_up = jnp.broadcast_to(avg, (avg.shape[0], h32, w32, 128))

        feat32_arm = AttentionRefinement(128, name="arm32")(feat32)
        feat32_sum = feat32_arm + avg_up
        feat32_up = _resize_nearest(feat32_sum, h16, w16)
        feat32_up = ConvBNReLU(128, 3, name="conv_head32")(feat32_up)

        feat16_arm = AttentionRefinement(128, name="arm16")(feat16)
        feat16_sum = feat16_arm + feat32_up
        feat16_up = _resize_nearest(feat16_sum, h8, w8)
        feat16_up = ConvBNReLU(128, 3, name="conv_head16")(feat16_up)

        return feat8, feat16_up, feat32_up


class FeatureFusion(nn.Module):
    ch: int = 256

    @nn.compact
    def __call__(self, fsp, fcp):
        fcat = jnp.concatenate([fsp, fcp], axis=-1)
        feat = ConvBNReLU(self.ch, 1, name="convblk")(fcat)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.ch // 4, (1, 1), use_bias=False, param_dtype=jnp.float32, name="conv1")(atten)
        atten = jax.nn.relu(atten)
        atten = nn.Conv(self.ch, (1, 1), use_bias=False, param_dtype=jnp.float32, name="conv2")(atten)
        atten = jax.nn.sigmoid(atten.astype(jnp.float32)).astype(feat.dtype)
        return feat * atten + feat


class BiSeNetOutput(nn.Module):
    mid_ch: int
    n_classes: int = N_PARSING_CLASSES

    @nn.compact
    def __call__(self, x):
        x = ConvBNReLU(self.mid_ch, 3, name="conv")(x)
        return nn.Conv(self.n_classes, (1, 1), use_bias=False, param_dtype=jnp.float32, name="conv_out")(x)


class BiSeNet(nn.Module):
    """Input (B, H, W, 3) ImageNet-normalised; returns (B, H, W, 19) logits."""

    n_classes: int = N_PARSING_CLASSES

    @nn.compact
    def __call__(self, x):
        hh, ww = x.shape[1], x.shape[2]
        feat_res8, feat_cp8, _ = ContextPath(name="cp")(x)
        fused = FeatureFusion(256, name="ffm")(feat_res8, feat_cp8)
        out = BiSeNetOutput(256, self.n_classes, name="conv_out")(fused)
        return _resize_bilinear_align_corners(out, hh, ww)


IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def parsing_preprocess(images01: jax.Array, size: int = 512) -> jax.Array:
    """[0,1] images → 512² ImageNet-normalised (face_parsing_demo.py:297+)."""
    b = images01.shape[0]
    x = jax.image.resize(images01, (b, size, size, 3), method="bilinear")
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


def parse_faces(
    params, images01: jax.Array, model: BiSeNet | None = None, size: int = 512
) -> jax.Array:
    """[0,1] images → (B, size, size) int32 class map."""
    model = model or BiSeNet()
    logits = model.apply({"params": params}, parsing_preprocess(images01, size))
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
