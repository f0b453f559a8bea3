"""VQ first-stage models (legacy REFace alternatives), Flax.

Capability parity with `/root/reference/REFace/ldm/models/autoencoder.py:14-283`
(``VQModel`` / ``VQModelInterface``): the vector-quantised first stage kept by
the reference for configs that predate the KL autoencoder. Shares the
Encoder/Decoder blocks of `vface_tpu.models.vae`; adds the codebook with
straight-through quantisation (taming-transformers ``VectorQuantizer2``
semantics: nearest codebook entry by L2, commitment loss β=0.25).

``VQModelInterface`` semantics (autoencoder.py:264-283): encode returns the
*pre-quant* latent; decode optionally quantises first — preserved via the
``force_not_quantize`` flag.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vface_tpu.models.layers import Conv
from vface_tpu.models.vae import Decoder, Encoder, VAEConfig


@dataclasses.dataclass(frozen=True)
class VQConfig:
    vae: VAEConfig = dataclasses.field(
        default_factory=lambda: dataclasses.replace(VAEConfig(), double_z=False)
    )
    n_embed: int = 8192
    embed_dim: int = 4
    beta: float = 0.25

    @classmethod
    def tiny(cls):
        return cls(
            vae=dataclasses.replace(VAEConfig.tiny(), double_z=False),
            n_embed=64,
            embed_dim=4,
        )


class VectorQuantizer(nn.Module):
    n_embed: int
    embed_dim: int
    beta: float = 0.25

    @nn.compact
    def __call__(self, z):
        codebook = self.param(
            "embedding",
            nn.initializers.uniform(scale=2.0 / self.n_embed),
            (self.n_embed, self.embed_dim),
        )
        flat = z.reshape(-1, self.embed_dim)
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2 * flat @ codebook.T
            + jnp.sum(codebook**2, axis=1)[None]
        )
        idx = jnp.argmin(d, axis=1)
        zq = codebook[idx].reshape(z.shape)
        loss = self.beta * jnp.mean((jax.lax.stop_gradient(zq) - z) ** 2) + jnp.mean(
            (zq - jax.lax.stop_gradient(z)) ** 2
        )
        zq = z + jax.lax.stop_gradient(zq - z)  # straight-through
        return zq, loss, idx.reshape(z.shape[:-1])


class VQModel(nn.Module):
    cfg: VQConfig = VQConfig()

    def setup(self):
        self.encoder = Encoder(self.cfg.vae)
        self.decoder = Decoder(self.cfg.vae)
        self.quant_conv = Conv(self.cfg.embed_dim, kernel=1, name="quant_conv")
        self.post_quant_conv = Conv(self.cfg.vae.z_channels, kernel=1, name="post_quant_conv")
        self.quantize = VectorQuantizer(self.cfg.n_embed, self.cfg.embed_dim, self.cfg.beta)

    def encode(self, x):
        """Pre-quant latent (VQModelInterface.encode, autoencoder.py:269-272)."""
        return self.quant_conv(self.encoder(x))

    def decode(self, h, force_not_quantize: bool = False):
        if force_not_quantize:
            quant = h
        else:
            quant, _, _ = self.quantize(h)
        return self.decoder(self.post_quant_conv(quant))

    def __call__(self, x):
        h = self.encode(x)
        quant, emb_loss, idx = self.quantize(h)
        return self.decoder(self.post_quant_conv(quant)), emb_loss
