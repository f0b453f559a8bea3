"""Batched face detection — the dlib HOG-detector replacement (+ multi-face).

The reference detects exactly one face per frame with dlib's HOG+SVM
(`/root/reference/REFace/src/utils/alignmengt.py:39-81`, CPU, frame-at-a-time)
and has no multi-face support. This module provides a TPU-native detector:

* :class:`FaceDetector` — an anchor-free center-heatmap net (CenterNet-style:
  peak heatmap + size + offset at 1/8 resolution). Fully batched/jittable;
  weights are trained by distillation like `LandmarkNet`
  (`scripts/distill_landmarks.py` pattern).
* :func:`decode_detections` — top-K peak decoding with max-pool NMS, static
  shapes (always returns K boxes + scores; callers threshold on score).

Multi-face swapping: `VideoSwapPipeline.swap_video_frames` handles the
single-face flow; for K faces, run `decode_detections`, crop each box region,
and run the per-face pipeline, compositing paste-backs in score order.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn


class FaceDetector(nn.Module):
    """(B, H, W, 3) in [0,1] → heatmap (B, d/8, d/8, 1), size (…, 2), offset (…, 2)
    where d = ``detect_size``.

    Domain-transfer design (same as `LandmarkNet` v2): inputs are resized to
    one canonical detection scale and reduced to a photometric-invariant
    per-image-standardized gray+gradient featurization, so synthetic-trained
    weights transfer to real photos.  Decoded boxes live in detect-space;
    `decode_detections(..., image_hw=)` maps them back to frame pixels.
    """

    width: int = 32
    detect_size: int = 256

    @nn.compact
    def __call__(self, x):
        b, in_h, in_w, _ = x.shape
        w = self.width
        if (in_h, in_w) != (self.detect_size, self.detect_size):
            x = jax.image.resize(
                x, (b, self.detect_size, self.detect_size, 3), method="bilinear"
            )
        g = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
        mu = jnp.mean(g, axis=(1, 2, 3), keepdims=True)
        sd = jnp.std(g, axis=(1, 2, 3), keepdims=True) + 1e-5
        g = (g - mu) / sd
        gx = jnp.pad(g[:, :, 1:] - g[:, :, :-1], ((0, 0), (0, 0), (0, 1), (0, 0)))
        gy = jnp.pad(g[:, 1:] - g[:, :-1], ((0, 0), (0, 1), (0, 0), (0, 0)))
        x = jnp.concatenate([g, gx, gy], axis=-1)
        for i, (ch, stride) in enumerate(
            [(w, 2), (w * 2, 1), (w * 2, 2), (w * 4, 1), (w * 4, 2), (w * 4, 1)]
        ):
            x = nn.Conv(ch, (3, 3), strides=(stride, stride), padding=1,
                        param_dtype=jnp.float32, name=f"conv_{i}")(x)
            x = nn.GroupNorm(num_groups=8, name=f"gn_{i}")(x)
            x = jax.nn.relu(x)
        heat = nn.Conv(1, (1, 1), param_dtype=jnp.float32, name="heat")(x)
        size = nn.Conv(2, (1, 1), param_dtype=jnp.float32, name="size")(x)
        offset = nn.Conv(2, (1, 1), param_dtype=jnp.float32, name="offset")(x)
        return jax.nn.sigmoid(heat.astype(jnp.float32)), size, offset


def decode_detections(
    heat: jax.Array,      # (B, h, w, 1)
    size: jax.Array,      # (B, h, w, 2)
    offset: jax.Array,    # (B, h, w, 2)
    top_k: int = 4,
    stride: int = 8,
    image_hw: tuple[int, int] | None = None,
):
    """→ boxes (B, K, 4) [cx, cy, w, h] in pixels + scores (B, K).

    Max-pool NMS: a location survives only if it is its 3×3 neighborhood's
    maximum (standard CenterNet decoding); then static top-K.  When the
    detector ran on a resized canonical frame, pass the ORIGINAL frame's
    ``image_hw`` — boxes are rescaled from detect-space to frame pixels.
    """
    b, h, w, _ = heat.shape
    hm = heat[..., 0]
    pooled = nn.max_pool(hm[..., None], (3, 3), strides=(1, 1), padding="SAME")[..., 0]
    keep = jnp.where(hm >= pooled, hm, 0.0)
    flat = keep.reshape(b, h * w)
    scores, idx = jax.lax.top_k(flat, top_k)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    off = offset.reshape(b, h * w, 2)
    sz = size.reshape(b, h * w, 2)
    off_k = jnp.take_along_axis(off, idx[..., None], axis=1)
    sz_k = jnp.take_along_axis(sz, idx[..., None], axis=1)
    cx = (xs + off_k[..., 0]) * stride
    cy = (ys + off_k[..., 1]) * stride
    bw = jax.nn.softplus(sz_k[..., 0]) * stride
    bh = jax.nn.softplus(sz_k[..., 1]) * stride
    if image_hw is not None:
        sy = image_hw[0] / (h * stride)
        sx = image_hw[1] / (w * stride)
        cx, bw = cx * sx, bw * sx
        cy, bh = cy * sy, bh * sy
    boxes = jnp.stack([cx, cy, bw, bh], axis=-1)
    return boxes, scores


DEFAULT_DETECTOR_WEIGHTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "weights", "detector.npz",
)


def load_default_detector_params(path: str = DEFAULT_DETECTOR_WEIGHTS):
    """Shipped FaceDetector weights (distilled on multi-face synthetic scenes,
    `scripts/distill_detector.py`). Returns the param tree, or None when no
    checkpoint is present (callers then fall back to random init)."""
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    import numpy as np

    from vface_tpu.runtime.checkpoint import load_params_npz

    net = FaceDetector()
    like = jax.eval_shape(
        lambda r: net.init(r, jnp.zeros((1, 64, 64, 3)))["params"], jax.random.PRNGKey(0)
    )
    like = jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), like)
    return load_params_npz(path, like)


def crop_boxes(images01: jax.Array, boxes: jax.Array, out_size: int) -> jax.Array:
    """Crop box regions (B, K, 4) → (B, K, out, out, 3) with bilinear sampling."""
    from vface_tpu.ops.warp import grid_sample

    b, k, _ = boxes.shape
    u = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size - 0.5
    gy, gx = jnp.meshgrid(u, u, indexing="ij")
    cx, cy = boxes[..., 0], boxes[..., 1]
    bw, bh = boxes[..., 2], boxes[..., 3]
    px = cx[..., None, None] + gx[None, None] * bw[..., None, None]
    py = cy[..., None, None] + gy[None, None] * bh[..., None, None]
    coords = jnp.stack([px, py], axis=-1)  # (B, K, out, out, 2)
    out = jax.vmap(lambda img, c: grid_sample(jnp.broadcast_to(img[None], (k,) + img.shape), c))(
        images01, coords
    )
    return out
