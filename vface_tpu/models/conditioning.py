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
    # the reference defaults weight_division TRUE when the key is absent
    # (ddpm.py:645-647) and no shipped YAML sets it — the conditioning token
    # is (clip·w_c + id·w_id + lm·w_lm) / (w_c + w_id + w_lm) at runtime
    weight_division: bool = True
    context_dim: int = 768
    arcface_stages: tuple = IR_50_STAGES
    # token-combination mode (ddpm.py:1023-1040):
    #   "sum"      — weighted sum into one token (the shipped config)
    #   "concat"   — concat_feat: cat(c, c_id, lm_raw136) → Dense(768)
    #   "stack"    — stack_feat: three tokens stacked on the sequence axis
    #   "sep_head" — land_mark_id_seperate_layers / sep_head_att: 1536-d token,
    #                split across attention heads (unet dual-context path)
    mode: str = "sum"

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
        if self.cfg.mode == "concat":
            # concat_feat: Linear(768+768+136 → 768) (ddpm.py:1024-1026)
            self.concat_feat_proj = nn.Dense(d, param_dtype=jnp.float32)
        # ddpm.py:699 — the learnable unconditional embedding.
        self.learnable_vector = self.param(
            "learnable_vector", nn.initializers.normal(1.0), (1, 1, d)
        )
        if self.cfg.mode == "stack":
            # stack_feat: extra uncond tokens for the stacked layout (ddpm.py:695-697)
            self.other_learnable_vector = self.param(
                "other_learnable_vector", nn.initializers.normal(1.0), (1, 2, d)
            )

    def uncond(self, batch: int) -> jax.Array:
        uc = self.learnable_vector
        if self.cfg.mode == "stack":
            uc = jnp.concatenate([uc, self.other_learnable_vector], axis=1)
        elif self.cfg.mode == "sep_head":
            uc = jnp.concatenate([uc, uc], axis=-1)
        return jnp.broadcast_to(uc, (batch,) + uc.shape[1:])

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

        c2 = jnp.zeros_like(c)
        if cfg.id_weight > 0 and src_face01 is not None:
            from vface_tpu.models.arcface import safe_l2_normalize

            feats = self.arcface(arcface_preprocess(src_face01))
            # the reference's extract_feats ends in l2_norm (model_irse.py:69)
            # — ID_proj_out consumes the NORMALISED embedding (ddpm.py:1010-1011)
            feats = safe_l2_normalize(feats)
            c2 = self.id_proj_out(feats)[:, None, :]

        lm_raw = None
        lm = jnp.zeros_like(c)
        if landmarks136 is not None:
            lm_raw = landmarks136.astype(jnp.float32)
            if lm_raw.ndim == 2:
                lm_raw = lm_raw[:, None, :]
            lm = self.landmark_proj_out(lm_raw)

        if cfg.mode == "concat":
            # cat(c, c_id, raw landmarks) → proj (ddpm.py:1024-1026)
            raw = lm_raw if lm_raw is not None else jnp.zeros(c.shape[:2] + (136,))
            return self.concat_feat_proj(jnp.concatenate([c, c2, raw], axis=-1))
        if cfg.mode == "stack":
            # three tokens on the sequence axis (ddpm.py:1028-1031)
            return jnp.concatenate([c, c2, lm], axis=1)

        total = cfg.clip_weight + (cfg.id_weight if cfg.id_weight > 0 else 0.0)
        cond = c * cfg.clip_weight + c2 * cfg.id_weight
        if cfg.mode == "sep_head":
            # weighted clip+id token ++ landmark token → 1536-d dual context
            # (ddpm.py:1032-1038; consumed by the unet head-split path)
            if cfg.weight_division:
                cond = cond / total
            return jnp.concatenate([cond, lm], axis=-1)
        if cfg.landmark_cond and landmarks136 is not None:
            cond = cond + lm * cfg.landmarks_weight
            total += cfg.landmarks_weight
        if cfg.weight_division:
            cond = cond / total
        return cond
