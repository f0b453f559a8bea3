"""Training: the REFace self-supervised inpainting objective, TPU-native.

Capability parity with the reference training driver and loss stack
(`/root/reference/REFace/main.py:447-758` + ``p_losses_face``
`ldm/models/diffusion/ddpm.py:1679-1837`):

* ε-MSE "simple" loss with VLB weighting (ddpm.py:1816-1832);
* train-time DDIM reconstruction: re-noise each sample to t≈T-1, run an
  S=4-step differentiable DDIM chain (Reconstruct_DDIM_steps,
  train.yaml:89), decode every pred_x0 and apply the masked ArcFace ID loss
  (weight 0.3) and LPIPS (weight 0.1) against GT (ddpm.py:1696-1797);
* unconditional-embedding dropout ``u_cond_percent 0.2`` → learnable vector
  (ddpm.py:1489-1502);
* AdamW lr 1e-5 with linear warmup (LambdaLinearScheduler, 10k steps).

Replacing PyTorch-Lightning DDP/NCCL (main.py:511-526): one jitted
:func:`train_step` with donated state, parameters replicated and the batch
sharded over the mesh's ``data`` axis — XLA inserts the gradient
all-reduce over ICI. Memory for backprop-through-sampler is handled by the
UNet's `use_remat` (jax.checkpoint) instead of torch checkpointing.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax

from vface_tpu.models.arcface import IRSE50, arcface_preprocess
from vface_tpu.models.ldm import VFaceModel
from vface_tpu.samplers.ddim import ddim_sample_train


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1.0e-5
    warmup_steps: int = 10_000
    u_cond_percent: float = 0.2
    reconstruct_steps: int = 4
    id_loss_weight: float = 0.3
    lpips_loss_weight: float = 0.1
    landmark_loss_weight: float = 0.0
    l_simple_weight: float = 1.0
    original_elbo_weight: float = 0.0
    reconstruct: bool = True
    weight_decay: float = 1e-2


def trainable_mask(params, partial_unet: bool = False):
    """True where the reference optimizes (ddpm.py:2175-2220 + the
    FrozenCLIPEmbedder freeze list, modules.py:236-251): the full UNet (or
    only its attn2/norm2 params when ``partial_unet``), the CLIP mapper2 +
    final_ln2, the LDM conditioning heads and the learnable uncond vector.
    VAE, ArcFace, the CLIP vision tower and visual_projection stay frozen."""

    def decide(path) -> bool:
        keys = [getattr(p, "key", None) for p in path]
        top = keys[0]
        if top == "vae":
            return False
        if top == "unet":
            if not partial_unet:
                return True
            return any(k in ("attn2", "norm2") for k in keys if isinstance(k, str))
        if top == "cond":
            sub = keys[1]
            if sub == "arcface":
                return False
            if sub == "clip_encoder":
                inner = keys[2]
                return isinstance(inner, str) and (
                    inner.startswith("mapper2") or inner == "final_ln2"
                )
            return True  # proj_out_*, id_proj_out, landmark_proj_out, learnable_vector
        return True  # e.g. landmark_head

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves = [decide(kp) for kp, _ in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], leaves)


def make_optimizer(
    cfg: TrainConfig, params=None, partial_unet: bool = False
) -> optax.GradientTransformation:
    """AdamW with the reference's LambdaLinearScheduler multiplier
    (train.yaml:23-31: 10k warmup 1e-6→1, then flat 1.0). When ``params`` is
    given, updates are masked to the reference's trainable set — frozen
    sub-nets get zero updates and no optimizer state."""
    from vface_tpu.utils.lr_schedules import lambda_linear_schedule

    mult = lambda_linear_schedule(warm_up_steps=cfg.warmup_steps)
    sched = lambda step: cfg.learning_rate * mult(step)
    tx = optax.adamw(sched, b1=0.9, b2=0.999, weight_decay=cfg.weight_decay)
    if params is None:
        return tx
    mask = trainable_mask(params, partial_unet)
    labels = jax.tree_util.tree_map(lambda m: "train" if m else "freeze", mask)
    # NB optax.masked passes raw gradients through unmasked leaves (it does
    # NOT zero them) — multi_transform with set_to_zero is the freezing tool.
    return optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)


def vlb_weights(model: VFaceModel) -> jnp.ndarray:
    """Per-timestep VLB weight (ddpm.py:294-299 lvlb_weights for eps param)."""
    s = model.schedule
    betas = jnp.asarray(s.betas)
    acp = jnp.asarray(s.alphas_cumprod)
    acp_prev = jnp.asarray(s.alphas_cumprod_prev)
    alphas = 1.0 - betas
    w = betas**2 / (2 * (1 - acp) * alphas * (1 - acp_prev) + 1e-20)
    return w.at[0].set(w[1])


def p_losses_face(
    model: VFaceModel,
    params,
    batch: dict,
    rng: jax.Array,
    cfg: TrainConfig = TrainConfig(),
    perceptual_fn: Optional[Callable] = None,
):
    """The full REFace face loss. ``batch`` carries device arrays:

    gt_image    (B, H, W, 3)  in [-1, 1]
    inpaint     (B, H, W, 3)  masked GT
    mask        (B, H, W, 1)  1 = keep (background)
    ref_clip    (B, 224, 224, 3) CLIP-normalised reference face
    ref_face01  (B, 112·k, ·, 3) [0,1] reference for ArcFace
    landmarks   (B, 136)
    """
    r_t, r_noise, r_drop, r_recon, r_enc0, r_enc1 = jax.random.split(rng, 6)
    b = batch["gt_image"].shape[0]

    # --- latents (ddpm.py:1191-1216) ---
    # the reference trains on SAMPLED posteriors (get_first_stage_encoding
    # uses encoder_posterior.sample(), ddpm.py:850-857); mode() is the
    # inference-time behavior only.
    z0 = model.encode_first_stage_sample(params, batch["gt_image"], r_enc0)
    z_inpaint = model.encode_first_stage_sample(params, batch["inpaint"], r_enc1)
    hl = z0.shape[1]
    mask_lat = jax.image.resize(batch["mask"], (b, hl, hl, 1), method="bilinear")

    # --- conditioning with uncond dropout (ddpm.py:1489-1502) ---
    cond = model.conditioning(
        params,
        batch["ref_clip"],
        batch.get("landmarks"),
        None,
        batch.get("ref_face01"),
    )
    uncond = model.uncond(params, b)
    drop = jax.random.uniform(r_drop, (b, 1, 1)) < cfg.u_cond_percent
    cond = jnp.where(drop, uncond, cond)

    # --- eps loss at a random t (ddpm.py:1682-1689, 1816-1832) ---
    t = jax.random.randint(r_t, (b,), 0, model.schedule.num_timesteps)
    noise = jax.random.normal(r_noise, z0.shape)
    z_noisy = model.q_sample(z0, t, noise)
    x9 = model.build_unet_input(z_noisy, z_inpaint, mask_lat)
    need_feats = cfg.landmark_loss_weight > 0 and "landmarks" in batch
    if need_feats:
        eps, feats = model.apply_model(params, x9, t, cond, return_features=True)
    else:
        eps = model.apply_model(params, x9, t, cond)
    simple = jnp.mean((eps - noise) ** 2, axis=(1, 2, 3))
    loss = cfg.l_simple_weight * jnp.mean(simple)
    logs = {"loss_simple": jnp.mean(simple)}
    if cfg.original_elbo_weight > 0:
        vlb = jnp.mean(vlb_weights(model)[t] * simple)
        loss = loss + cfg.original_elbo_weight * vlb
        logs["loss_vlb"] = vlb

    if need_feats:
        # optional landmark MSE from UNet features (ddpm.py:1692-1694,
        # weight 0 in the shipped config). The reference's head consumes a
        # 640-ch full-res feature; here the two final 64²-scale output-block
        # activations (model_channels each) are concatenated to match width.
        from vface_tpu.preprocess.landmarks import UNetLandmarkHead

        feat = jnp.concatenate([feats[-2], feats[-1]], axis=-1)
        params_head = params.get("landmark_head")
        if params_head is not None:
            pred_lm = UNetLandmarkHead().apply({"params": params_head}, feat)
            lm_loss = jnp.mean((pred_lm - batch["landmarks"]) ** 2)
            loss = loss + cfg.landmark_loss_weight * lm_loss
            logs["loss_landmark"] = lm_loss

    # --- train-time DDIM reconstruction (ddpm.py:1696-1797) ---
    if cfg.reconstruct:
        t_max = model.schedule.num_timesteps - 1
        noise_hi = jax.random.normal(r_recon, z0.shape)
        t_hi = jnp.full((b,), t_max, jnp.int32)
        z_hi = model.q_sample(z0, t_hi, noise_hi)
        # per-sample descending timestep chains ending at 0 (ddim_w_inv.py:826-858)
        steps = cfg.reconstruct_steps
        seq = jnp.stack(
            [jnp.full((b,), int(t_max * (steps - i) / steps) - 1, jnp.int32) for i in range(steps)]
        )
        z_rec, pred_x0s = ddim_sample_train(model, params, z_hi, seq, cond, z_inpaint, mask_lat)
        img_rec = model.decode_first_stage(params, z_rec)
        gt01 = (batch["gt_image"] + 1.0) * 0.5
        rec01 = jnp.clip((img_rec + 1.0) * 0.5, 0.0, 1.0)
        # masked ID loss (face region = 1 - keep mask), weight 0.3
        face_region = 1.0 - batch["mask"]
        arcface = IRSE50(stages=model.cfg.cond.arcface_stages)
        feats_gt = arcface.apply(
            {"params": params["cond"]["arcface"]}, arcface_preprocess(gt01 * face_region)
        )
        feats_rec = arcface.apply(
            {"params": params["cond"]["arcface"]}, arcface_preprocess(rec01 * face_region)
        )
        na = feats_gt / (jnp.linalg.norm(feats_gt, axis=-1, keepdims=True) + 1e-8)
        nb = feats_rec / (jnp.linalg.norm(feats_rec, axis=-1, keepdims=True) + 1e-8)
        idl = jnp.mean(1.0 - jnp.sum(na * nb, axis=-1))
        loss = loss + cfg.id_loss_weight * idl
        logs["loss_id"] = idl
        if perceptual_fn is not None and cfg.lpips_loss_weight > 0:
            # 3-scale LPIPS vs GT (ddpm.py:1779-1797)
            lp = 0.0
            for s in (1, 2, 4):
                a = img_rec[:, ::s, ::s, :]
                g = batch["gt_image"][:, ::s, ::s, :]
                lp = lp + jnp.mean(perceptual_fn(a, g))
            loss = loss + cfg.lpips_loss_weight * lp
            logs["loss_lpips"] = lp

    logs["loss"] = loss
    return loss, logs


def make_train_step(
    model: VFaceModel,
    optimizer: optax.GradientTransformation,
    cfg: TrainConfig = TrainConfig(),
    perceptual_fn: Optional[Callable] = None,
):
    """Returns ``train_step(params, opt_state, batch, rng) -> (params, opt_state, logs)``.

    Jit/pjit by the caller with batch sharded over ``data`` and params
    replicated; gradient psum is inserted by XLA from the shardings.
    """

    def train_step(params, opt_state, batch, rng):
        (loss, logs), grads = jax.value_and_grad(
            lambda p: p_losses_face(model, p, batch, rng, cfg, perceptual_fn), has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, logs

    return train_step
