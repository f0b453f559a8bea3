"""AutoencoderKL — the KL-f8 first stage of Stable Diffusion, TPU-native.

Capability parity with the reference first stage
(`/root/reference/REFace/ldm/models/autoencoder.py:285-424` and the enc/dec
blocks in `ldm/modules/diffusionmodules/model.py:216-835`), re-expressed as
pure-functional NHWC Flax modules:

* Encoder: conv_in → 4 levels of 2 ResnetBlocks (ch_mult 1,2,4,4) with strided
  downsample convs (asymmetric (0,1) pad like the reference, model.py:108-118)
  → mid (res, attn, res) → GroupNorm/SiLU → conv_out (2*z channels, double_z).
* Decoder mirrors it with 3 ResnetBlocks per level and nearest-2x upsampling.
* ``quant_conv`` / ``post_quant_conv`` 1x1 convs and the
  :class:`DiagonalGaussian` posterior (autoencoder.py:324-335,
  ldm/modules/distributions/distributions.py).

Config matches `configs/train.yaml:49-68`: ch 128, ch_mult (1,2,4,4),
num_res_blocks 2, no attn resolutions, z_channels 4, scale_factor 0.18215.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vface_tpu.models.layers import (
    Conv,
    GroupNorm32,
    SelfAttention2D,
    nonlinearity,
    upsample_nearest_2x,
)

SD_SCALE_FACTOR = 0.18215  # train.yaml:18


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    embed_dim: int = 4
    in_channels: int = 3
    out_channels: int = 3
    double_z: bool = True
    dtype: Any = jnp.float32

    @classmethod
    def tiny(cls):
        """Small config for unit tests / the multichip dryrun."""
        return cls(ch=32, ch_mult=(1, 2), num_res_blocks=1, dtype=jnp.float32)


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupNorm32(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nonlinearity(h)
        h = Conv(self.out_ch, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nonlinearity(h)
        h = Conv(self.out_ch, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = Conv(self.out_ch, kernel=1, dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class Downsample(nn.Module):
    """Strided conv with the reference's asymmetric (0,1)x(0,1) padding."""

    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return Conv(self.out_ch, stride=2, padding="VALID", dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = upsample_nearest_2x(x)
        return Conv(self.out_ch, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = Conv(cfg.ch, dtype=cfg.dtype, name="conv_in")(x)
        for i, mult in enumerate(cfg.ch_mult):
            ch = cfg.ch * mult
            for j in range(cfg.num_res_blocks):
                h = ResnetBlock(ch, dtype=cfg.dtype, name=f"down_{i}_block_{j}")(h)
            if i != len(cfg.ch_mult) - 1:
                h = Downsample(ch, dtype=cfg.dtype, name=f"down_{i}_downsample")(h)
        ch = cfg.ch * cfg.ch_mult[-1]
        h = ResnetBlock(ch, dtype=cfg.dtype, name="mid_block_1")(h)
        h = SelfAttention2D(dtype=cfg.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(ch, dtype=cfg.dtype, name="mid_block_2")(h)
        h = GroupNorm32(epsilon=1e-6, dtype=cfg.dtype, name="norm_out")(h)
        h = nonlinearity(h)
        out_ch = cfg.z_channels * (2 if cfg.double_z else 1)
        return Conv(out_ch, dtype=cfg.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        ch = cfg.ch * cfg.ch_mult[-1]
        h = Conv(ch, dtype=cfg.dtype, name="conv_in")(z)
        h = ResnetBlock(ch, dtype=cfg.dtype, name="mid_block_1")(h)
        h = SelfAttention2D(dtype=cfg.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(ch, dtype=cfg.dtype, name="mid_block_2")(h)
        for i in reversed(range(len(cfg.ch_mult))):
            ch = cfg.ch * cfg.ch_mult[i]
            for j in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(ch, dtype=cfg.dtype, name=f"up_{i}_block_{j}")(h)
            if i != 0:
                h = Upsample(ch, dtype=cfg.dtype, name=f"up_{i}_upsample")(h)
        h = GroupNorm32(epsilon=1e-6, dtype=cfg.dtype, name="norm_out")(h)
        h = nonlinearity(h)
        return Conv(cfg.out_channels, dtype=cfg.dtype, name="conv_out")(h)


class DiagonalGaussian:
    """Posterior N(mean, exp(logvar)); logvar clamped to [-30, 20] like the reference."""

    def __init__(self, params: jax.Array):
        mean, logvar = jnp.split(params, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, rng: jax.Array) -> jax.Array:
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape, self.mean.dtype)

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self) -> jax.Array:
        return 0.5 * jnp.sum(
            self.mean**2 + jnp.exp(self.logvar) - 1.0 - self.logvar, axis=(1, 2, 3)
        )


class AutoencoderKL(nn.Module):
    """KL autoencoder. ``encode`` returns the posterior; ``decode`` maps z → image.

    The LDM-side scale factor (z * 0.18215) is applied by the caller
    (`vface_tpu.models.ldm`), mirroring ddpm.py:1402-1420.
    """

    cfg: VAEConfig = VAEConfig()

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)
        self.quant_conv = Conv(
            2 * self.cfg.embed_dim if self.cfg.double_z else self.cfg.embed_dim,
            kernel=1,
            dtype=self.cfg.dtype,
            name="quant_conv",
        )
        self.post_quant_conv = Conv(
            self.cfg.z_channels, kernel=1, dtype=self.cfg.dtype, name="post_quant_conv"
        )

    def encode(self, x) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(x))
        return DiagonalGaussian(moments)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None, sample: bool = False):
        posterior = self.encode(x)
        z = posterior.sample(rng) if sample else posterior.mode()
        return self.decode(z), posterior
