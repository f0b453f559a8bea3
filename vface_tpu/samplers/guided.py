"""Guided DDIM sampling — ID-similarity scaling and gradient guidance.

Capability parity with the reference's two guided samplers:

* ``ddim.DDIMSampler.p_sample_ddim_guided``
  (`/root/reference/REFace/ldm/models/diffusion/ddim.py:254-323`): per sample,
  decode pred_x0, mask to the face region, measure ArcFace cosine similarity
  to the source, and scale the ``dir_xt`` term by ``clamp(3·sim, 0, 1)`` —
  samples that already resemble the source keep their trajectory, dissimilar
  ones are pulled toward pred_x0.
* ``ddim_guided.DDIMSampler.p_sample_ddim_guided_forward``
  (`ldm/models/diffusion/ddim_guided.py:368-637`): enable gradients inside
  the step, decode pred_x0 *differentiably*, compute an ID loss against the
  source, and nudge x along −∇ₓ loss. Torch needs ``torch.enable_grad`` +
  autograd bookkeeping; in JAX this is one ``jax.grad`` through the jitted
  decode+ArcFace composition.

Both run inside one `lax.scan` like the other samplers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vface_tpu.models.arcface import IRSE50, arcface_preprocess
from vface_tpu.models.ldm import VFaceModel
from vface_tpu.utils.schedule import DDIMSchedule


def _id_similarity(model: VFaceModel, params, pred_x0, src_emb, keep_mask_img):
    """Decode pred_x0, mask to the face region, embed, cosine vs src_emb."""
    img = model.decode_first_stage(params, pred_x0)
    img01 = jnp.clip((img + 1.0) * 0.5, 0.0, 1.0)
    face = img01 * (1.0 - keep_mask_img)
    arcface = IRSE50(stages=model.cfg.cond.arcface_stages)
    from vface_tpu.models.arcface import safe_l2_normalize

    emb = arcface.apply({"params": params["cond"]["arcface"]}, arcface_preprocess(face))
    emb = safe_l2_normalize(emb)
    return jnp.sum(emb * src_emb, axis=-1)  # (B,)


def ddim_sample_guided(
    model: VFaceModel,
    params,
    x_T: jax.Array,
    cond: jax.Array,
    uncond: jax.Array,
    inpaint_latent: jax.Array,
    mask_latent: jax.Array,
    src_emb: jax.Array,          # (B, 512) normalised source ArcFace embedding
    keep_mask_img: jax.Array,    # (B, H, W, 1) 1 = background (image res)
    num_steps: int = 50,
    cfg_scale: float = 3.0,
    id_dir_scaling: bool = True,
    grad_weight: float = 0.0,
):
    """Guided CFG DDIM. ``id_dir_scaling`` enables the similarity-scaled
    dir_xt (ddim.py mechanism); ``grad_weight > 0`` adds the gradient nudge
    (ddim_guided.py mechanism)."""
    sch = DDIMSchedule.create(model.schedule, num_steps)
    num_steps = sch.num_steps  # table may exceed the request (non-divisor S)
    b = x_T.shape[0]
    ts = jnp.asarray(sch.timesteps)
    a = jnp.asarray(sch.alphas)
    a_prev = jnp.asarray(sch.alphas_prev)
    s1m = jnp.asarray(sch.sqrt_one_minus_alphas)
    extra = jnp.concatenate([inpaint_latent, mask_latent], axis=-1)
    c_in = jnp.concatenate([uncond, cond], axis=0)

    def id_loss_of_x0(pred_x0):
        sim = _id_similarity(model, params, pred_x0, src_emb, keep_mask_img)
        return jnp.mean(1.0 - sim)

    def body(x, idx):
        index = num_steps - 1 - idx
        t = jnp.full((b,), ts[index], dtype=jnp.int32)
        x9 = jnp.concatenate([x, extra], axis=-1)
        eps = model.apply_model(
            params,
            jnp.concatenate([x9, x9], axis=0),
            jnp.concatenate([t, t], axis=0),
            c_in,
        )
        e_u, e_c = jnp.split(eps, 2, axis=0)
        e_t = e_u + cfg_scale * (e_c - e_u)
        pred_x0 = (x - s1m[index] * e_t) / jnp.sqrt(a[index])

        if grad_weight > 0.0:
            g = jax.grad(id_loss_of_x0)(pred_x0)
            pred_x0 = pred_x0 - grad_weight * g

        dir_xt = jnp.sqrt(jnp.clip(1.0 - a_prev[index], 0.0)) * e_t
        if id_dir_scaling:
            sim = _id_similarity(model, params, pred_x0, src_emb, keep_mask_img)
            scale = jnp.clip(3.0 * sim, 0.0, 1.0)[:, None, None, None]
            dir_xt = dir_xt * scale
        x_prev = jnp.sqrt(a_prev[index]) * pred_x0 + dir_xt
        return x_prev, pred_x0

    z0, traj = jax.lax.scan(body, x_T.astype(jnp.float32), jnp.arange(num_steps))
    return z0, traj
