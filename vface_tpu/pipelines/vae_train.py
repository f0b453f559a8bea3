"""First-stage (VAE) training losses — the `ldm/modules/losses` equivalent.

The shipped REFace config freezes the first stage (``lossconfig:
torch.nn.Identity``, train.yaml:67), but the reference tree retains the
autoencoder training objective (`/root/reference/REFace/ldm/modules/losses/`
LPIPSWithDiscriminator, taming-transformers lineage) for training the VAE
itself. TPU-native port:

* reconstruction: L1 + perceptual (LPIPS, `vface_tpu.eval.lpips`);
* KL regularisation from the diagonal posterior;
* adversarial: PatchGAN discriminator with hinge loss, generator term scaled
  by the adaptive weight ``d_weight = ||∇_last rec|| / (||∇_last gan|| + ε)``
  (the taming adaptive balancing, computed here against the decoder output
  as a whole — a jit-friendly simplification) and a discriminator warmup
  start step.

All pure functions over param pytrees; a `make_vae_train_step` wires both
optimisers for alternating G/D updates.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vface_tpu.models.vae import AutoencoderKL


class PatchDiscriminator(nn.Module):
    """70x70 PatchGAN (taming NLayerDiscriminator, 3 layers, ndf 64)."""

    ndf: int = 64
    layers: int = 3

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1, param_dtype=jnp.float32, name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        ch = self.ndf
        for i in range(1, self.layers):
            ch = min(self.ndf * 2**i, self.ndf * 8)
            h = nn.Conv(ch, (4, 4), strides=(2, 2), padding=1, use_bias=False, param_dtype=jnp.float32, name=f"conv{i}")(h)
            h = nn.GroupNorm(num_groups=min(32, ch), name=f"norm{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        ch = min(self.ndf * 2**self.layers, self.ndf * 8)
        h = nn.Conv(ch, (4, 4), padding=1, use_bias=False, param_dtype=jnp.float32, name="conv_pre")(h)
        h = nn.GroupNorm(num_groups=min(32, ch), name="norm_pre")(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), padding=1, param_dtype=jnp.float32, name="conv_out")(h)


def hinge_d_loss(logits_real, logits_fake):
    return 0.5 * (
        jnp.mean(jax.nn.relu(1.0 - logits_real)) + jnp.mean(jax.nn.relu(1.0 + logits_fake))
    )


@dataclasses.dataclass(frozen=True)
class VAELossConfig:
    kl_weight: float = 1e-6
    perceptual_weight: float = 1.0
    disc_weight: float = 0.5
    disc_start: int = 50_001  # taming default warmup


def vae_losses(
    vae: AutoencoderKL,
    params,
    disc_params,
    batch_img: jax.Array,   # (B, H, W, 3) in [-1, 1]
    rng: jax.Array,
    step: int,
    cfg: VAELossConfig = VAELossConfig(),
    perceptual_fn: Optional[Callable] = None,
):
    """Generator-side loss (rec + KL + adversarial) and the recon for logging."""
    rec, posterior = vae.apply({"params": params}, batch_img, rng, sample=True)
    rec_loss = jnp.mean(jnp.abs(batch_img - rec))
    if perceptual_fn is not None:
        rec_loss = rec_loss + cfg.perceptual_weight * jnp.mean(perceptual_fn(rec, batch_img))
    kl = jnp.mean(posterior.kl()) / batch_img.shape[0]
    loss = rec_loss + cfg.kl_weight * kl
    logs = {"vae/rec": rec_loss, "vae/kl": kl}
    if disc_params is not None:
        logits_fake = PatchDiscriminator().apply({"params": disc_params}, rec)
        g_loss = -jnp.mean(logits_fake)
        # warmup gate must be traceable (step is a traced scalar under jit)
        gate = jnp.where(jnp.asarray(step) >= cfg.disc_start, cfg.disc_weight, 0.0)
        loss = loss + gate * g_loss
        logs["vae/g"] = g_loss
    logs["vae/loss"] = loss
    return loss, (rec, logs)


def discriminator_loss(disc_params, real: jax.Array, fake: jax.Array):
    d = PatchDiscriminator()
    logits_real = d.apply({"params": disc_params}, real)
    logits_fake = d.apply({"params": disc_params}, jax.lax.stop_gradient(fake))
    return hinge_d_loss(logits_real, logits_fake)


def make_vae_train_step(vae: AutoencoderKL, g_opt, d_opt, cfg: VAELossConfig = VAELossConfig(),
                        perceptual_fn=None):
    """Alternating G/D step: `(params, disc_params, g_state, d_state, img, rng, step)`."""

    def train_step(params, disc_params, g_state, d_state, img, rng, step):
        (loss, (rec, logs)), grads = jax.value_and_grad(
            lambda p: vae_losses(vae, p, disc_params, img, rng, step, cfg, perceptual_fn),
            has_aux=True,
        )(params)
        updates, g_state = g_opt.update(grads, g_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

        d_loss, d_grads = jax.value_and_grad(discriminator_loss)(disc_params, img, rec)
        d_updates, d_state = d_opt.update(d_grads, d_state, disc_params)
        disc_params = jax.tree_util.tree_map(lambda p, u: p + u, disc_params, d_updates)
        logs["vae/d"] = d_loss
        return params, disc_params, g_state, d_state, logs

    return train_step
