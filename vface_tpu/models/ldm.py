"""VFaceModel — the latent-diffusion face-swap model bundle (TPU-native LDM).

Capability parity with ``LatentDiffusion`` (`/root/reference/REFace/ldm/models/
diffusion/ddpm.py:574-2336`) restructured for JAX: instead of a stateful
nn.Module owning sub-nets, :class:`VFaceModel` is a *static* bundle of Flax
module definitions + schedule tables, and every operation is a pure function
``f(params, ...)`` suitable for ``jit`` / ``pjit``. Params live in one pytree
``{"unet": ..., "vae": ..., "cond": ...}``.

Key semantics reproduced:

* 9-channel UNet input ``concat(z_noisy, z_inpaint, mask_latent)``
  (ddpm.py:1191-1216 builds it once; the samplers re-concat per step like
  ddim_w_inv.py:420-424).
* first-stage scale factor 0.18215 on encode, /0.18215 on decode
  (ddpm.py:1402-1420, 1277-1287).
* ``q_sample`` forward noising (ddpm.py:1617-1621).
* ``predict_start_from_noise`` x0 reconstruction (ddpm.py:463-467).
* conditioning via :class:`~vface_tpu.models.conditioning.Conditioner`
  (ddpm.py:872-1045) and the learnable uncond vector for CFG.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from vface_tpu.models.conditioning import Conditioner, ConditionerConfig
from vface_tpu.models.unet import InjectionSpec, UNetConfig, UNetModel
from vface_tpu.models.vae import SD_SCALE_FACTOR, AutoencoderKL, VAEConfig
from vface_tpu.utils.schedule import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    unet: UNetConfig = UNetConfig()
    vae: VAEConfig = VAEConfig()
    cond: ConditionerConfig = ConditionerConfig()
    scale_factor: float = SD_SCALE_FACTOR
    timesteps: int = 1000
    linear_start: float = 0.00085
    linear_end: float = 0.0120
    image_size: int = 512  # pixel resolution; latent is /8

    @classmethod
    def sd_v1_inpaint(cls, dtype=jnp.bfloat16):
        return cls(
            unet=UNetConfig.sd_v1_inpaint(dtype=dtype),
            vae=dataclasses.replace(VAEConfig(), dtype=dtype),
        )

    @classmethod
    def tiny(cls, image_size: int = 32):
        """Topology-faithful micro config for tests and the multichip dryrun."""
        return cls(
            unet=dataclasses.replace(UNetConfig.tiny(), context_dim=64),
            vae=VAEConfig.tiny(),
            cond=ConditionerConfig.tiny(),
            image_size=image_size,
        )

    @classmethod
    def mid(cls, image_size: int = 128):
        """Mid-scale bundle for the in-env trained-weight quality loop
        (VERDICT r4 item 2): a 3-level UNet over a /4 latent (32² at 128² —
        1024 ds1 tokens, enough spatial structure for FSAI/FGATS to act on),
        trainable on one chip in about an hour via
        scripts/train_synthetic_tiny.py --config mid."""
        return cls(
            unet=dataclasses.replace(
                UNetConfig.tiny(), model_channels=64, channel_mult=(1, 2, 4),
                num_heads=4, context_dim=128,
            ),
            vae=dataclasses.replace(VAEConfig.tiny(), ch=64, ch_mult=(1, 2, 4)),
            cond=dataclasses.replace(ConditionerConfig.tiny(), context_dim=128),
            image_size=image_size,
        )

    @property
    def latent_size(self) -> int:
        return self.image_size // (2 ** (len(self.vae.ch_mult) - 1))


def _collect_fgats(col) -> dict:
    """Flatten the sown 'fgats' collection into {site: {"q": arr, "k": arr}}.

    The sow path is <site>/block_<i>/attn1/carry_{q,k}; the top-level key is
    the injection site name the FlowPack ``prev`` dict is keyed by.
    """
    out = {}

    def walk(node, site):
        if not isinstance(node, dict) and not hasattr(node, "items"):
            return
        items = dict(node)
        if "carry_q" in items:
            out[site] = {"q": items["carry_q"], "k": items["carry_k"]}
            return
        for key, sub in items.items():
            walk(sub, site)

    for site, sub in dict(col).items():
        walk(sub, site)
    return out


class VFaceModel:
    """Static model bundle; all methods are pure in ``params``."""

    def __init__(self, cfg: ModelConfig = ModelConfig()):
        self.cfg = cfg
        self.unet = UNetModel(cfg.unet)
        self.vae = AutoencoderKL(cfg.vae)
        self.conditioner = Conditioner(cfg.cond)
        self.schedule = DiffusionSchedule.create(
            "linear", cfg.timesteps, cfg.linear_start, cfg.linear_end
        )

    # ---------------------------------------------------------------- init
    def init(self, rng: jax.Array) -> dict:
        cfg = self.cfg
        r_unet, r_vae, r_cond = jax.random.split(rng, 3)
        hl = cfg.latent_size
        unet_p = self.unet.init(
            r_unet,
            jnp.zeros((1, hl, hl, cfg.unet.in_channels)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 1, cfg.unet.context_dim)),
        )["params"]
        vae_p = self.vae.init(
            r_vae, jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
        )["params"]
        sz = cfg.cond.clip.image_size
        cond_p = self.conditioner.init(
            r_cond,
            jnp.zeros((1, sz, sz, 3)),
            jnp.zeros((1, 136)),
            jnp.zeros((1, sz, sz, 3)),  # target branch so proj_out_target exists
            jnp.zeros((1, 112, 112, 3)),
        )["params"]
        return {"unet": unet_p, "vae": vae_p, "cond": cond_p}

    # -------------------------------------------------------- first stage
    def encode_first_stage(self, params, img) -> jax.Array:
        """img (B,H,W,3) in [-1,1] → scaled latent (B,h,w,4). Posterior mode
        (the reference samples at train time; inference uses mode-like
        behavior through its seeded sample — we expose both)."""
        post = self.vae.apply({"params": params["vae"]}, img, method=AutoencoderKL.encode)
        return post.mode() * self.cfg.scale_factor

    def encode_first_stage_sample(self, params, img, rng) -> jax.Array:
        post = self.vae.apply({"params": params["vae"]}, img, method=AutoencoderKL.encode)
        return post.sample(rng) * self.cfg.scale_factor

    def encode_first_stage_given_eps(self, params, img, eps) -> jax.Array:
        """Posterior sample with an externally supplied standard-normal draw —
        lets parity tests share the draw with a torch oracle."""
        post = self.vae.apply({"params": params["vae"]}, img, method=AutoencoderKL.encode)
        return (post.mean + post.std * eps) * self.cfg.scale_factor

    def decode_first_stage(self, params, z) -> jax.Array:
        return self.vae.apply(
            {"params": params["vae"]}, z / self.cfg.scale_factor, method=AutoencoderKL.decode
        )

    # -------------------------------------------------------- conditioning
    def conditioning(
        self, params, src_clip, landmarks136=None, tar_clip=None, src_face01=None
    ) -> jax.Array:
        return self.conditioner.apply(
            {"params": params["cond"]}, src_clip, landmarks136, tar_clip, src_face01
        )

    def uncond(self, params, batch: int) -> jax.Array:
        return self.conditioner.apply(
            {"params": params["cond"]}, batch, method=Conditioner.uncond
        )

    # -------------------------------------------------------------- UNet
    def build_unet_input(self, z, z_inpaint, mask_latent) -> jax.Array:
        """concat([z, z_inpaint, mask]) → 9 channels (ddpm.py:1216)."""
        return jnp.concatenate([z, z_inpaint, mask_latent], axis=-1)

    def apply_model(
        self,
        params,
        x9,
        t,
        context,
        flow=None,
        injection: Optional[InjectionSpec] = None,
        return_features: bool = False,
        encoder_cache=None,
        return_encoder_cache: bool = False,
        return_fgats_carry: bool = False,
    ):
        """ε-prediction. x9 (B,h,w,9); t (B,) int32; context (B,1,D).

        ``return_fgats_carry`` appends a {site: {"q", "k"}} dict of each flow
        site's last-frame post-FSAI q/k — the cross-window FGATS carry (see
        `vface_tpu.ops.attention.FlowPack`).
        """
        if not return_fgats_carry:
            return self.unet.apply(
                {"params": params["unet"]},
                x9,
                t,
                context,
                flow=flow,
                injection=injection,
                return_features=return_features,
                encoder_cache=encoder_cache,
                return_encoder_cache=return_encoder_cache,
            )
        out, variables = self.unet.apply(
            {"params": params["unet"]},
            x9,
            t,
            context,
            flow=flow,
            injection=injection,
            return_features=return_features,
            encoder_cache=encoder_cache,
            return_encoder_cache=return_encoder_cache,
            mutable=["fgats"],
        )
        carry = _collect_fgats(variables.get("fgats", {}))
        if isinstance(out, tuple):
            return (*out, carry)
        return out, carry

    # ----------------------------------------------------------- schedule
    def q_sample(self, z0, t, noise) -> jax.Array:
        s = self.schedule
        a = jnp.asarray(s.sqrt_alphas_cumprod)[t][:, None, None, None]
        b = jnp.asarray(s.sqrt_one_minus_alphas_cumprod)[t][:, None, None, None]
        return a * z0 + b * noise

    def predict_start_from_noise(self, z_t, t, noise) -> jax.Array:
        s = self.schedule
        a = jnp.asarray(s.sqrt_recip_alphas_cumprod)[t][:, None, None, None]
        b = jnp.asarray(s.sqrt_recipm1_alphas_cumprod)[t][:, None, None, None]
        return a * z_t - b * noise
