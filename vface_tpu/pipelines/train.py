"""Training: the REFace self-supervised inpainting objective, TPU-native.

Capability parity with the reference training driver and loss stack
(`/root/reference/REFace/main.py:447-758` + ``p_losses_face``
`ldm/models/diffusion/ddpm.py:1679-1837`):

* ε-MSE "simple" loss with VLB weighting (ddpm.py:1816-1832);
* train-time DDIM reconstruction: re-noise each sample to t=T-1 with the
  SAME noise draw, flip the reference batch so each sample reconstructs with
  a different source's conditioning (the swap-training signal,
  ddpm.py:1715-1717), run the S=4-step differentiable DDIM chain
  (Reconstruct_DDIM_steps, train.yaml:89), decode every logged intermediate
  and apply the masked ArcFace ID loss per intermediate vs the flipped
  reference identity (weight 0.3) plus LPIPS per intermediate at 3
  adaptive-avg-pooled scales vs GT (weight 0.1) (ddpm.py:1696-1797);
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
    # program-splitting support (make_split_train_step): "all" = the fused
    # loss; "eps" / "recon" compute only that part's terms while consuming
    # the SAME rng draws, so grads("eps") + grads("recon") == grads("all").
    # Exists because the remote TPU compiler crashes on the fused 512²
    # recon2+ID backward (PLAN.md round-4 item 3); never changes semantics.
    loss_parts: str = "all"


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
    fixed: Optional[dict] = None,
):
    """The full REFace face loss. ``batch`` carries device arrays:

    gt_image    (B, H, W, 3)  in [-1, 1]
    inpaint     (B, H, W, 3)  masked GT
    mask        (B, H, W, 1)  1 = keep (background)
    ref_clip    (B, 224, 224, 3) CLIP-normalised reference face
    ref_face01  (B, 112·k, ·, 3) [0,1] reference for ArcFace
    landmarks   (B, 136)

    ``fixed`` (tests only) overrides every stochastic draw so a torch oracle
    can share them: keys ``t`` (B,), ``noise`` (B,h,w,4), ``drop`` (B,1,1)
    bool, ``enc_eps0``/``enc_eps1`` (B,h,w,4).
    """
    r_t, r_noise, r_drop, r_enc0, r_enc1 = jax.random.split(rng, 5)
    b = batch["gt_image"].shape[0]
    fixed = fixed or {}

    # --- latents (ddpm.py:1191-1216) ---
    # the reference trains on SAMPLED posteriors (get_first_stage_encoding
    # uses encoder_posterior.sample(), ddpm.py:850-857); mode() is the
    # inference-time behavior only.
    if "enc_eps0" in fixed:
        z0 = model.encode_first_stage_given_eps(params, batch["gt_image"], fixed["enc_eps0"])
        z_inpaint = model.encode_first_stage_given_eps(params, batch["inpaint"], fixed["enc_eps1"])
    else:
        z0 = model.encode_first_stage_sample(params, batch["gt_image"], r_enc0)
        z_inpaint = model.encode_first_stage_sample(params, batch["inpaint"], r_enc1)
    hl = z0.shape[1]
    # antialias=False: torchvision Resize (ddpm.py:1215) does not antialias
    mask_lat = jax.image.resize(
        batch["mask"], (b, hl, hl, 1), method="bilinear", antialias=False
    )

    # --- conditioning with uncond dropout (ddpm.py:1489-1502) ---
    # the train call passes tar=GT (ddpm.py:1237): with the shipped
    # Source+Target_CLIP_feat config the GT image feeds proj_out_target
    from vface_tpu.models.clip import clip_preprocess

    gt01 = (batch["gt_image"] + 1.0) * 0.5
    tar_clip = clip_preprocess(gt01, size=model.cfg.cond.clip.image_size)
    cond = model.conditioning(
        params,
        batch["ref_clip"],
        batch.get("landmarks"),
        tar_clip,
        batch.get("ref_face01"),
    )
    uncond = model.uncond(params, b)
    drop = fixed.get("drop")
    if drop is None:
        drop = jax.random.uniform(r_drop, (b, 1, 1)) < cfg.u_cond_percent
    cond = jnp.where(drop, uncond, cond)

    # --- eps loss at a random t (ddpm.py:1682-1689, 1816-1832) ---
    t = fixed.get("t")
    if t is None:
        t = jax.random.randint(r_t, (b,), 0, model.schedule.num_timesteps)
    noise = fixed.get("noise")
    if noise is None:
        noise = jax.random.normal(r_noise, z0.shape)
    z_noisy = model.q_sample(z0, t, noise)
    x9 = model.build_unet_input(z_noisy, z_inpaint, mask_lat)
    eps_part = cfg.loss_parts in ("all", "eps")
    need_feats = eps_part and cfg.landmark_loss_weight > 0 and "landmarks" in batch
    loss = 0.0
    logs = {}
    if eps_part:
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
    if cfg.reconstruct and cfg.loss_parts in ("all", "recon"):
        from vface_tpu.models.clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD
        from vface_tpu.ops.pooling import adaptive_avg_pool

        t_max = model.schedule.num_timesteps - 1  # t_new ≡ T-1 (ddpm.py:1696)
        # the reference REUSES the eps-loss noise draw for the recon start
        # (ddpm.py:1699 q_sample(..., noise=noise)) — no fresh draw
        t_hi = jnp.full((b,), t_max, jnp.int32)
        z_hi = model.q_sample(z0, t_hi, noise)
        # flip the reference batch (Same_image_reconstruct defaults False →
        # reference=torch.flip(reference,[0]), ddpm.py:1715-1717): each sample
        # reconstructs with a DIFFERENT source's conditioning — the
        # swap-training signal. The recon cond is rebuilt WITHOUT uncond
        # dropout, from the flipped reference with un-flipped landmarks and
        # the un-flipped GT target branch (ddpm.py:1717).
        ref_clip_f = jnp.flip(batch["ref_clip"], axis=0)
        ref_face01_f = (
            jnp.flip(batch["ref_face01"], axis=0) if "ref_face01" in batch else None
        )
        cond_rec = model.conditioning(
            params, ref_clip_f, batch.get("landmarks"), tar_clip, ref_face01_f
        )
        z_rec, inters = ddim_sample_train(
            model, params, z_hi, t_max, cfg.reconstruct_steps, cond_rec, z_inpaint, mask_lat
        )
        # decode EVERY logged intermediate — including the noisy start latent
        # the reference seeds its intermediates list with (ddim.py:482;
        # ddpm.py:1736-1738 decodes all of them)
        k = inters.shape[0]
        dec = model.decode_first_stage(
            params, inters.reshape((k * b,) + inters.shape[2:])
        ).reshape((k, b) + batch["gt_image"].shape[1:])
        hh, wwi = batch["gt_image"].shape[1:3]
        # masked ID loss per intermediate vs the FLIPPED reference identity
        # (ddpm.py:1755-1773): predictions masked by the face region obtained
        # by upsampling the LATENT mask channel (1 - resize(x_start[:,8]),
        # :1762), masking applied in [-1,1] space; the target is un-masked.
        face_region = 1.0 - jax.image.resize(
            mask_lat, (b, hh, wwi, 1), method="bilinear", antialias=False
        )
        arcface = IRSE50(stages=model.cfg.cond.arcface_stages)

        def id_feats(img01):
            f = arcface.apply(
                {"params": params["cond"]["arcface"]}, arcface_preprocess(img01)
            )
            from vface_tpu.models.arcface import safe_l2_normalize

            return safe_l2_normalize(f)  # NaN-free grad at f == 0 (zero batch)

        if ref_face01_f is not None:
            ref01_f = ref_face01_f
        else:
            # un_norm_clip of the flipped CLIP-normalised reference (ddpm.py:1756)
            ref01_f = ref_clip_f * jnp.asarray(CLIP_IMAGE_STD) + jnp.asarray(CLIP_IMAGE_MEAN)
        feats_ref = jax.lax.stop_gradient(id_feats(ref01_f))  # y_feats.detach(), ddpm.py:135
        idl = 0.0
        for j in range(k):
            masked01 = (dec[j] * face_region + 1.0) * 0.5
            f = id_feats(masked01)
            idl = idl + jnp.mean(1.0 - jnp.sum(f * feats_ref, axis=-1))
        idl = idl / k  # mean over intermediates (ddpm.py:1771)
        loss = loss + cfg.id_loss_weight * idl
        logs["loss_id"] = idl
        if perceptual_fn is not None and cfg.lpips_loss_weight > 0:
            # LPIPS per intermediate × 3 adaptive-avg-pooled scales vs GT,
            # SUMMED over both axes (ddpm.py:1781-1788 accumulates, never
            # averages). The reference hardcodes 512//2**i because its images
            # are always 512²; we use H//2**i — identical at the operating
            # point, size-generic otherwise.
            lp = 0.0
            for j in range(k):
                for i in range(3):
                    a = adaptive_avg_pool(dec[j], hh // 2**i, wwi // 2**i)
                    g = adaptive_avg_pool(batch["gt_image"], hh // 2**i, wwi // 2**i)
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


def make_split_train_step(
    model: VFaceModel,
    optimizer: optax.GradientTransformation,
    cfg: TrainConfig = TrainConfig(),
    perceptual_fn: Optional[Callable] = None,
):
    """Semantically-identical train step split across THREE programs:
    grads of the eps/VLB part, grads of the recon/ID/LPIPS part, and the
    optimizer apply — for shapes whose FUSED fwd+bwd the remote TPU compiler
    cannot build (the deterministic 512² bs1 recon2+ID tpu_compile_helper
    crash, PLAN.md r4 item 3). Both loss programs consume the same rng
    draws, so grad_eps + grad_recon == the fused gradient exactly; the sum
    happens inside the apply program.

    Returns ``step(params, opt_state, batch, rng)`` — a host function
    dispatching the three jitted programs.
    """
    cfg_eps = dataclasses.replace(cfg, loss_parts="eps")
    cfg_rec = dataclasses.replace(cfg, loss_parts="recon")

    @jax.jit
    def grads_eps(params, batch, rng):
        return jax.value_and_grad(
            lambda p: p_losses_face(model, p, batch, rng, cfg_eps, perceptual_fn),
            has_aux=True,
        )(params)

    @jax.jit
    def grads_rec(params, batch, rng):
        return jax.value_and_grad(
            lambda p: p_losses_face(model, p, batch, rng, cfg_rec, perceptual_fn),
            has_aux=True,
        )(params)

    @jax.jit
    def apply(params, opt_state, g_a, g_b):
        grads = jax.tree_util.tree_map(jnp.add, g_a, g_b)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    def step(params, opt_state, batch, rng):
        (_, logs_a), g_a = grads_eps(params, batch, rng)
        (_, logs_b), g_b = grads_rec(params, batch, rng)
        params, opt_state = apply(params, opt_state, g_a, g_b)
        logs = dict(logs_a)
        logs.update(logs_b)
        logs["loss"] = logs_a["loss"] + logs_b["loss"]
        return params, opt_state, logs

    return step
