"""The REFace conditioning-token builder, as a pure Flax module.

Capability parity with ``LatentDiffusion.conditioning_with_feat``
(`/root/reference/REFace/ldm/models/diffusion/ddpm.py:872-1045`) in its
*active* configuration (`configs/train.yaml:70-81`: clip_weight 1.0,
ID_weight 10.0, Landmark_cond True, Landmarks_weight 0.05,
Source_CLIP_feat + Target_CLIP_feat both True, no concat/stack/sep-head):

    c_clip = proj_out_source(CLIP(src))  [+ proj_out_target(CLIP(tar))]
    c_id   = ID_proj_out(ArcFace(src))            # (B, 1, 768)
    c_lm   = landmark_proj_out(landmarks_136)     # (B, 1, 768)
    c      = w_clip * c_clip + w_id * c_id + w_lm * c_lm

plus the learnable unconditional vector used for CFG / cond dropout
(ddpm.py:695-699, 1489-1502). The dlib CPU landmark loop of the reference
(ddpm.py:1068-1099) is replaced by landmarks supplied as a batched (B, 136)
array from `vface_tpu.preprocess.landmarks` — no host round trip in the
conditioning path.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vface_tpu.models.arcface import IR_50_STAGES, IRSE50, arcface_preprocess
from vface_tpu.models.clip import CLIPConditioner, CLIPVisionConfig


@dataclasses.dataclass(frozen=True)
class ConditionerConfig:
    clip: CLIPVisionConfig = CLIPVisionConfig()
    clip_weight: float = 1.0
    id_weight: float = 10.0
    landmarks_weight: float = 0.05
    landmark_cond: bool = True
    source_clip_feat: bool = True
    target_clip_feat: bool = True
    weight_division: bool = False
    context_dim: int = 768
    arcface_stages: tuple = IR_50_STAGES

    @classmethod
    def tiny(cls):
        return cls(
            clip=CLIPVisionConfig.tiny(),
            context_dim=64,
            arcface_stages=((16, 1), (32, 1)),
        )


class Conditioner(nn.Module):
    """Builds the (B, 1, context_dim) conditioning token and the uncond token."""

    cfg: ConditionerConfig = ConditionerConfig()

    def setup(self):
        d = self.cfg.context_dim
        self.clip_encoder = CLIPConditioner(
            dataclasses.replace(self.cfg.clip, projection_dim=d)
        )
        self.arcface = IRSE50(stages=self.cfg.arcface_stages)
        self.proj_out_source = nn.Dense(d, param_dtype=jnp.float32)
        self.proj_out_target = nn.Dense(d, param_dtype=jnp.float32)
        self.id_proj_out = nn.Dense(d, param_dtype=jnp.float32)
        self.landmark_proj_out = nn.Dense(d, param_dtype=jnp.float32)
        # ddpm.py:699 — the learnable unconditional embedding.
        self.learnable_vector = self.param(
            "learnable_vector", nn.initializers.normal(1.0), (1, 1, d)
        )

    def uncond(self, batch: int) -> jax.Array:
        return jnp.broadcast_to(self.learnable_vector, (batch, 1, self.cfg.context_dim))

    def __call__(
        self,
        src_clip_pixels: jax.Array,
        landmarks136: Optional[jax.Array] = None,
        tar_clip_pixels: Optional[jax.Array] = None,
        src_face01: Optional[jax.Array] = None,
    ) -> jax.Array:
        """src/tar_clip_pixels: CLIP-normalised 224² NHWC; src_face01: [0,1]
        source face for the ArcFace branch (defaults to de-normalised CLIP input)."""
        cfg = self.cfg
        c = self.proj_out_source(self.clip_encoder(src_clip_pixels))
        if cfg.target_clip_feat and tar_clip_pixels is not None:
            c = c + self.proj_out_target(self.clip_encoder(tar_clip_pixels))

        total = cfg.clip_weight
        cond = c * cfg.clip_weight
        if cfg.id_weight > 0 and src_face01 is not None:
            feats = self.arcface(arcface_preprocess(src_face01))
            c2 = self.id_proj_out(feats)[:, None, :]
            cond = cond + c2 * cfg.id_weight
            total += cfg.id_weight
        if cfg.landmark_cond and landmarks136 is not None:
            lm = self.landmark_proj_out(landmarks136.astype(jnp.float32))
            if lm.ndim == 2:
                lm = lm[:, None, :]
            cond = cond + lm * cfg.landmarks_weight
            total += cfg.landmarks_weight
        if cfg.weight_division:
            cond = cond / total
        return cond
