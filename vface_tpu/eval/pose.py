"""Pose metric: Hopenet yaw/pitch/roll L2 between swapped and target faces.

Capability parity with `/root/reference/REFace/eval_tool/Pose/pose_compare.py`
(+ ``eval_tool/face_vid2vid/modules/hopenet.py``): ResNet-50 trunk with three
66-bin classification heads; the continuous angle is the softmax expectation
over bins mapped to degrees (pose_compare.py:156-168):

    angle = (sum_i softmax(logits)_i * i) * 3 - 99.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vface_tpu.eval.backbones import ResNet50


class Hopenet(nn.Module):
    bins: int = 66

    @nn.compact
    def __call__(self, x):
        feat = ResNet50(name="backbone")(x)
        yaw = nn.Dense(self.bins, param_dtype=jnp.float32, name="fc_yaw")(feat)
        pitch = nn.Dense(self.bins, param_dtype=jnp.float32, name="fc_pitch")(feat)
        roll = nn.Dense(self.bins, param_dtype=jnp.float32, name="fc_roll")(feat)
        return yaw, pitch, roll


def logits_to_degrees(logits: jax.Array) -> jax.Array:
    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    idx = jnp.arange(logits.shape[-1], dtype=jnp.float32)
    return jnp.sum(prob * idx, axis=-1) * 3.0 - 99.0


def head_pose(params, images01, model: Hopenet | None = None) -> jax.Array:
    """[0,1] face crops → (B, 3) (yaw, pitch, roll) degrees.

    ImageNet normalisation at 224², as pose_compare.py's transform stack.
    """
    model = model or Hopenet()
    b = images01.shape[0]
    x = jax.image.resize(jnp.asarray(images01), (b, 224, 224, 3), method="bilinear")
    mean = jnp.asarray((0.485, 0.456, 0.406))
    std = jnp.asarray((0.229, 0.224, 0.225))
    yaw, pitch, roll = model.apply({"params": params}, (x - mean) / std)
    return jnp.stack(
        [logits_to_degrees(yaw), logits_to_degrees(pitch), logits_to_degrees(roll)], axis=-1
    )


def pose_l2(pose_a: np.ndarray, pose_b: np.ndarray) -> float:
    """Mean L2 of (yaw, pitch, roll) differences (pose_compare.py final reduce)."""
    return float(np.linalg.norm(np.asarray(pose_a) - np.asarray(pose_b), axis=-1).mean())
