"""68-point facial landmarks — batched, on-device (the dlib replacement).

The reference runs dlib's C++ HOG detector + ensemble-of-regression-trees
landmarker per frame on the host, *inside the model's forward path*
(`/root/reference/REFace/ldm/models/diffusion/ddpm.py:704-708, 1068-1099` and
`src/utils/alignmengt.py:39-81`) — a GPU→CPU→GPU round trip every batch
(SURVEY hard-part #2). TPU-native replacement strategy:

1. :class:`LandmarkNet` — a small fully-convolutional heatmap regressor
   (stacked conv/pool → 68 heatmaps → soft-argmax) that runs batched under
   jit. Soft-argmax keeps it differentiable and avoids dynamic shapes.
   Weights are trainable from any 68-pt dataset (or distilled from dlib
   outputs offline); architecture is deliberately simple so a distilled
   checkpoint is cheap to produce.
2. :class:`UNetLandmarkHead` — parity port of the reference's
   ``LandmarkDetectionModel`` (ddpm.py:163-178): 640-ch UNet features →
   conv128 → maxpool → linear → 136, used by the optional landmark loss
   (ddpm.py:1692-1694, weight 0 in the shipped config).

The geometric consumers (`vface_tpu.preprocess.align.compute_quad`,
conditioning's 136-d vector) take plain (B, 68, 2) arrays, so a bit-accurate
dlib port can be slotted in later without touching callers.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

DEFAULT_WEIGHTS_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "weights", "landmark_net.npz"
)


class LandmarkNet(nn.Module):
    """(B, H, W, 3) in [0,1] → (B, 68, 2) pixel coords in input scale.

    Conv trunk at 1/8 resolution → 68 heatmaps → spatial soft-argmax.
    Handles arbitrary (non-square) frame geometry.
    """

    width: int = 32

    @nn.compact
    def __call__(self, x):
        b, in_h, in_w, _ = x.shape
        w = self.width
        for i, (ch, stride) in enumerate(
            [(w, 2), (w * 2, 1), (w * 2, 2), (w * 4, 1), (w * 4, 2), (w * 8, 1)]
        ):
            x = nn.Conv(ch, (3, 3), strides=(stride, stride), padding=1,
                        param_dtype=jnp.float32, name=f"conv_{i}")(x)
            x = nn.GroupNorm(num_groups=8, name=f"gn_{i}")(x)
            x = jax.nn.relu(x)
        heat = nn.Conv(68, (1, 1), param_dtype=jnp.float32, name="head")(x)  # (B, H/8, W/8, 68)
        hh, ww = heat.shape[1], heat.shape[2]
        flat = heat.reshape(b, hh * ww, 68)
        prob = jax.nn.softmax(flat.astype(jnp.float32), axis=1)
        ys = jnp.arange(hh, dtype=jnp.float32)
        xs = jnp.arange(ww, dtype=jnp.float32)
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        gx = jnp.einsum("bnk,n->bk", prob, xx.reshape(-1))
        gy = jnp.einsum("bnk,n->bk", prob, yy.reshape(-1))
        return jnp.stack([gx * (in_w / ww), gy * (in_h / hh)], axis=-1)  # (B, 68, 2) px


class UNetLandmarkHead(nn.Module):
    """Parity port of ddpm.py:163-178 (640ch 64² UNet feature → 136)."""

    @nn.compact
    def __call__(self, feats):
        x = nn.Conv(128, (3, 3), padding=1, param_dtype=jnp.float32, name="conv")(feats)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        b = x.shape[0]
        x = x.transpose(0, 3, 1, 2).reshape(b, -1)  # torch flatten order
        return nn.Dense(136, param_dtype=jnp.float32, name="fc")(x)


def landmarks_to_vector(landmarks68: jax.Array) -> jax.Array:
    """(B, 68, 2) → (B, 136) in the dlib x,y interleaved order the
    reference feeds to landmark_proj_out (ddpm.py:1086-1091: reshape(1,136))."""
    return landmarks68.reshape(landmarks68.shape[0], 136)


def load_default_landmark_params(path: str = DEFAULT_WEIGHTS_PATH):
    """Shipped LandmarkNet weights (distilled on procedurally rendered faces,
    `scripts/distill_landmarks.py --synthetic-faces`; see
    `vface_tpu.preprocess.synthetic_faces`). Returns the param tree, or None
    when no checkpoint is present (callers then fall back to random init —
    tiny/test mode)."""
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    from vface_tpu.runtime.checkpoint import load_params_npz

    net = LandmarkNet()
    like = jax.eval_shape(
        lambda r: net.init(r, jnp.zeros((1, 32, 32, 3)))["params"], jax.random.PRNGKey(0)
    )
    import numpy as np

    like = jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), like)
    return load_params_npz(path, like)
