"""CLIP ViT-L/14 vision tower + the REFace conditioning mapper, in Flax.

Capability parity with the reference's active conditioning encoder
(`/root/reference/REFace/ldm/modules/encoders/modules.py:211-261`
``FrozenCLIPEmbedder``): HF ``CLIPModel.vision_model`` pooled output →
``visual_projection`` (1024→768) → a trainable 5-layer width-768 single-head
transformer ``mapper2`` (`ldm/modules/encoders/xf.py:104-130`) → ``final_ln2``.
Output: one 768-d conditioning token per image.

TPU notes: quick-GELU (x·sigmoid(1.702x)) matches HF CLIP's activation; all
attention/matmuls run in the configured compute dtype with fp32 layernorms.
Weights convert from the HF checkpoint via ``vface_tpu.utils.torch_convert``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from vface_tpu.models.layers import LayerNormF32
from vface_tpu.ops.attention import multi_head_attention

CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x.astype(jnp.float32)).astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    mlp_ratio: int = 4
    projection_dim: int = 768
    dtype: Any = jnp.float32

    @classmethod
    def vit_l_14(cls, dtype=jnp.bfloat16):
        return cls(dtype=dtype)

    @classmethod
    def tiny(cls):
        return cls(image_size=32, patch_size=8, width=64, layers=2, heads=4, projection_dim=64)


class MHA(nn.Module):
    """Standard multi-head attention with fused in/out projections."""

    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias=None):
        d = nn.Dense
        q = d(self.width, dtype=self.dtype, param_dtype=jnp.float32, name="q")(x)
        k = d(self.width, dtype=self.dtype, param_dtype=jnp.float32, name="k")(x)
        v = d(self.width, dtype=self.dtype, param_dtype=jnp.float32, name="v")(x)
        o = multi_head_attention(q, k, v, self.heads, dtype=self.dtype, bias=bias)
        return d(self.width, dtype=self.dtype, param_dtype=jnp.float32, name="out")(o)


class EncoderLayer(nn.Module):
    width: int
    heads: int
    mlp_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, bias=None):
        h = LayerNormF32(dtype=self.dtype, name="ln1")(x)
        x = x + MHA(self.width, self.heads, dtype=self.dtype, name="attn")(h, bias=bias)
        h = LayerNormF32(dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(self.width * self.mlp_ratio, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(h)
        return x + h


class CLIPVisionTower(nn.Module):
    """HF CLIPVisionModel semantics: returns the pooled (post-LN CLS) embedding."""

    cfg: CLIPVisionConfig = CLIPVisionConfig()

    @nn.compact
    def __call__(self, pixels):
        cfg = self.cfg
        b = pixels.shape[0]
        n_patches = (cfg.image_size // cfg.patch_size) ** 2
        x = nn.Conv(
            cfg.width,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            dtype=cfg.dtype,
            param_dtype=jnp.float32,
            name="patch_embed",
        )(pixels.astype(cfg.dtype))
        x = x.reshape(b, n_patches, cfg.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (cfg.width,))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(cfg.dtype), (b, 1, cfg.width)), x], axis=1)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02), (n_patches + 1, cfg.width)
        )
        x = x + pos.astype(cfg.dtype)[None]
        x = LayerNormF32(dtype=cfg.dtype, name="pre_ln")(x)
        for i in range(cfg.layers):
            x = EncoderLayer(cfg.width, cfg.heads, cfg.mlp_ratio, dtype=cfg.dtype, name=f"layer_{i}")(x)
        pooled = LayerNormF32(dtype=cfg.dtype, name="post_ln")(x[:, 0])
        return pooled


class MapperBlock(nn.Module):
    """xf.py ResidualAttentionBlock: pre-LN attn + pre-LN 4x-GELU MLP."""

    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = LayerNormF32(dtype=self.dtype, name="ln1")(x)
        x = x + MHA(self.width, self.heads, dtype=self.dtype, name="attn")(h)
        h = LayerNormF32(dtype=self.dtype, name="ln2")(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(h)
        # exact (erf) GELU: xf.py MLP uses nn.GELU() default (xf.py:48-57)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(self.dtype)
        h = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(h)
        return x + h


class CLIPConditioner(nn.Module):
    """Vision tower → visual_projection → mapper2 (5 layers) → final_ln2.

    Returns (B, 1, 768): the single conditioning token the UNet cross-attends
    to (modules.py:252-261).
    """

    cfg: CLIPVisionConfig = CLIPVisionConfig()
    mapper_layers: int = 5

    @nn.compact
    def __call__(self, pixels):
        cfg = self.cfg
        pooled = CLIPVisionTower(cfg, name="vision")(pixels)
        z = nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=cfg.dtype, param_dtype=jnp.float32,
            name="visual_projection",
        )(pooled)
        z = z[:, None, :]
        for i in range(self.mapper_layers):
            z = MapperBlock(cfg.projection_dim, heads=1, dtype=cfg.dtype, name=f"mapper2_{i}")(z)
        z = LayerNormF32(dtype=cfg.dtype, name="final_ln2")(z)
        return z.astype(jnp.float32)


def clip_preprocess(images01: jax.Array, size: int = 224) -> jax.Array:
    """(B, H, W, 3) images in [0,1] → CLIP-normalised (B, size, size, 3).

    antialias=False matches torchvision ``TF.resize`` (the reference's resize
    at ddpm.py:912-913 does not antialias)."""
    b = images01.shape[0]
    x = jax.image.resize(images01, (b, size, size, 3), method="bilinear", antialias=False)
    mean = jnp.asarray(CLIP_IMAGE_MEAN, dtype=x.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, dtype=x.dtype)
    return (x - mean) / std


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """HF ``CLIPTextModel`` geometry (ViT-L/14 text tower defaults)."""

    vocab_size: int = 49408
    max_length: int = 77
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: int = 4
    projection_dim: int = 768
    eos_token_id: int = 49407
    dtype: Any = jnp.float32

    @classmethod
    def tiny(cls):
        return cls(vocab_size=64, max_length=16, width=32, layers=2, heads=2,
                   projection_dim=24, eos_token_id=63)


class CLIPTextTower(nn.Module):
    """HF ``CLIPTextModel`` semantics — the reference's text-prompt embedder
    (``FrozenCLIPTextEmbedder``, `/root/reference/REFace/ldm/modules/encoders/
    modules.py:178-207`; experiments-only there: the active configs never
    enable it, ddpm.py:751 keeps it commented out).

    token + position embeddings → causally-masked pre-LN transformer →
    final LN. Returns ``(last_hidden_state, pooled)`` where ``pooled`` is the
    final-LN hidden state at each row's FIRST EOS token (HF's pooling rule;
    with EOS doubling as the pad token, ``argmax(ids == eos)`` finds it).

    ``pad_mask``: optional (B, L) 1/0 array marking real tokens (the HF
    ``attention_mask`` the tokenizer emits under ``padding=True``); padded
    keys are masked out of every attention row.
    """

    cfg: CLIPTextConfig = CLIPTextConfig()

    @nn.compact
    def __call__(self, ids, pad_mask=None):
        cfg = self.cfg
        b, n = ids.shape
        tok = self.param(
            "token_embedding", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.width)
        )
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02), (cfg.max_length, cfg.width)
        )
        x = tok[ids].astype(cfg.dtype) + pos[:n].astype(cfg.dtype)[None]
        neg = jnp.float32(-1e9)
        causal = jnp.where(
            jnp.arange(n)[:, None] >= jnp.arange(n)[None, :], 0.0, neg
        )[None, None]  # (1, 1, L, L)
        if pad_mask is not None:
            causal = causal + jnp.where(pad_mask > 0, 0.0, neg)[:, None, None, :]
        for i in range(cfg.layers):
            x = EncoderLayer(cfg.width, cfg.heads, cfg.mlp_ratio, dtype=cfg.dtype,
                             name=f"layer_{i}")(x, bias=causal)
        x = LayerNormF32(dtype=cfg.dtype, name="final_ln")(x)
        eos_pos = jnp.argmax((ids == cfg.eos_token_id).astype(jnp.int32), axis=1)
        pooled = x[jnp.arange(b), eos_pos]
        return x.astype(jnp.float32), pooled.astype(jnp.float32)


class CLIPTextEncoder(nn.Module):
    """``FrozenCLIPTextEmbedder`` equivalent plus the ``text_projection`` /
    ``logit_scale`` pieces ``forward_probabilities`` needs (modules.py:266-281):
    pooled EOS state → bias-free projection to the shared CLIP space."""

    cfg: CLIPTextConfig = CLIPTextConfig()

    @nn.compact
    def __call__(self, ids, pad_mask=None):
        cfg = self.cfg
        hidden, pooled = CLIPTextTower(cfg, name="text")(ids, pad_mask=pad_mask)
        proj = nn.Dense(cfg.projection_dim, use_bias=False, dtype=cfg.dtype,
                        param_dtype=jnp.float32, name="text_projection")(
                            pooled.astype(cfg.dtype))
        return hidden, pooled, proj.astype(jnp.float32)


def clip_similarity_logits(text_embeds, image_embeds, logit_scale):
    """Cosine-similarity logits (modules.py:266-281 ``forward_probabilities``):
    L2-normalise both projected embedding sets, scale by exp(logit_scale).
    Returns logits_per_image (B_img, B_txt)."""
    t = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)
    v = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
    return jnp.exp(logit_scale) * (v @ t.T)


class CLIPImageEmbedderLegacy(nn.Module):
    """The 1024-d variant: pooled vision feature → 5-layer width-1024 mapper
    → final_ln, NO visual_projection (reference ``FrozenCLIPImageEmbedder``,
    modules.py:138-175). Consumers project 1024→768 via the LDM-level
    ``proj_out`` (ddpm.py:728-730)."""

    cfg: CLIPVisionConfig = CLIPVisionConfig()
    mapper_layers: int = 5

    @nn.compact
    def __call__(self, pixels):
        cfg = self.cfg
        pooled = CLIPVisionTower(cfg, name="vision")(pixels)
        z = pooled[:, None, :]  # (B, 1, width)
        for i in range(self.mapper_layers):
            z = MapperBlock(cfg.width, heads=1, dtype=cfg.dtype, name=f"mapper_{i}")(z)
        z = LayerNormF32(dtype=cfg.dtype, name="final_ln")(z)
        return z.astype(jnp.float32)
