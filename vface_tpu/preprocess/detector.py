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

import jax
import jax.numpy as jnp
from flax import linen as nn


class FaceDetector(nn.Module):
    """(B, S, S, 3) in [0,1] → heatmap (B, s/8, s/8, 1), size (…, 2), offset (…, 2)."""

    width: int = 32

    @nn.compact
    def __call__(self, x):
        w = self.width
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
):
    """→ boxes (B, K, 4) [cx, cy, w, h] in pixels + scores (B, K).

    Max-pool NMS: a location survives only if it is its 3×3 neighborhood's
    maximum (standard CenterNet decoding); then static top-K.
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
    boxes = jnp.stack([cx, cy, bw, bh], axis=-1)
    return boxes, scores


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
