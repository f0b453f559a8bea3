"""DDIM inversion with the latent stack kept in HBM (no disk round trips).

Capability parity with ``DDIMSampler.ddim_invert``
(`/root/reference/REFace/ldm/models/diffusion/ddim_w_inv.py:360-500`): an
ascending forward pass over the DDIM timesteps with the reference's custom
alpha indexing (ddim_w_inv.py:442-449):

    alpha_next = alphas_cumprod[step]
    alpha_cur  = alphas_cumprod[max(0, step - T // S)]
    x ← (x - sqrt(1 - alpha_cur) · e_t) · sqrt(alpha_next / alpha_cur)
        + sqrt(1 - alpha_next) · e_t

The reference saves the target chunk to ``ddim_latents_{t}.pt`` per step and
re-loads it per sampling step (ddim_w_inv.py:483-486, 628 — disk I/O in the
hot loop). Here the whole (S, B, h, w, 4) stack is the scan output and stays
in HBM (~5 MB/frame at 64² fp32).

The video driver inverts the 2B batch cat([z_target, z_source]) with
conditions cat([inverse_cond, src_cond]) and keeps only the target half
(`scripts/VFace_inference_batch.py:514-541`, ddim_w_inv.py:464-476) — pass the
concatenated batch and ``keep`` for that behavior. Hooks are OFF during
inversion (ddim_w_inv.py:389), so no injection arg exists here.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vface_tpu.models.ldm import VFaceModel
from vface_tpu.utils.schedule import DDIMSchedule


def ddim_invert(
    model: VFaceModel,
    params,
    z0: jax.Array,
    cond: jax.Array,
    inpaint_latent: jax.Array,
    mask_latent: jax.Array,
    num_steps: int = 50,
    uncond: Optional[jax.Array] = None,
    cfg_scale: float = 1.0,
    keep: Optional[int] = None,
    encoder_interval: int = 1,
    skip_last: int = 0,
):
    """Invert z0 → noise. Returns (x_T, latents (S - skip_last, keep, h, w, 4)).

    latents[i] is the saved chunk at timestep ``timesteps[i]`` — exactly what
    the 3-chunk sampler consumes at its step with the same timestep.
    ``encoder_interval > 1`` enables encoder propagation (see
    `vface_tpu.models.unet.UNetModel`) on the inversion forwards.

    ``skip_last`` drops the final ascending steps from the scan. The
    recon-free sampler consumes ONLY the t=961 entry (the reference's start
    code, VFace_inference_batch.py:541 — the second-to-last step for S=50);
    the reference still computes the last inversion step and discards it, so
    ``skip_last=1`` is output-identical there and saves one UNet pass.
    """
    sch = DDIMSchedule.create(model.schedule, num_steps)
    num_steps = sch.num_steps - skip_last  # table may exceed the request
    b = z0.shape[0]
    keep = keep if keep is not None else b
    ts = jnp.asarray(sch.timesteps)
    a_next = jnp.asarray(sch.inv_alpha_next)
    a_cur = jnp.asarray(sch.inv_alpha_cur)
    extra = jnp.concatenate([inpaint_latent, mask_latent], axis=-1)
    use_cfg = uncond is not None and cfg_scale != 1.0
    if use_cfg:
        c_in = jnp.concatenate([uncond, cond], axis=0)
    use_cache = encoder_interval > 1

    def eps_of(x9, t_in, c, cache, is_key):
        if not use_cache:
            return model.apply_model(params, x9, t_in, c), ()
        full = lambda xx, tt, cc: model.apply_model(
            params, xx, tt, c, return_encoder_cache=True
        )
        cached = lambda xx, tt, cc: model.apply_model(
            params, xx, tt, c, encoder_cache=cc, return_encoder_cache=True
        )
        return jax.lax.cond(is_key, full, cached, x9, t_in, cache)

    # Denser-early key schedule, in NOISE order: inversion ascends t, so the
    # fast-changing (high-noise) steps are at the END — mirror the mask.
    from vface_tpu.samplers.vface import encoder_key_steps

    key_mask = encoder_key_steps(num_steps, encoder_interval)

    def body(carry, i):
        x, cache = carry
        t = jnp.full((b,), ts[i], dtype=jnp.int32)
        x9 = jnp.concatenate([x, extra], axis=-1)
        is_key = key_mask[num_steps - 1 - i]
        if use_cfg:
            eps, cache = eps_of(
                jnp.concatenate([x9, x9], axis=0),
                jnp.concatenate([t, t], axis=0),
                c_in, cache, is_key,
            )
            e_uncond, e_cond = jnp.split(eps, 2, axis=0)
            e_t = e_uncond + cfg_scale * (e_cond - e_uncond)
        else:
            e_t, cache = eps_of(x9, t, cond, cache, is_key)
        an, ac = a_next[i], a_cur[i]
        x_next = (x - jnp.sqrt(1.0 - ac) * e_t) * jnp.sqrt(an / ac) + jnp.sqrt(1.0 - an) * e_t
        return (x_next, cache), x_next[:keep]

    if use_cache:
        x90 = jnp.concatenate([z0.astype(jnp.float32), extra], axis=-1)
        if use_cfg:
            x90 = jnp.concatenate([x90, x90], axis=0)
            t0 = jnp.zeros((2 * b,), jnp.int32)
            c0 = c_in
        else:
            t0, c0 = jnp.zeros((b,), jnp.int32), cond
        cache0 = jax.eval_shape(
            lambda: model.apply_model(params, x90, t0, c0, return_encoder_cache=True)
        )[1]
        cache0 = jax.tree_util.tree_map(lambda sh: jnp.zeros(sh.shape, sh.dtype), cache0)
    else:
        cache0 = ()
    (x_T, _), latents = jax.lax.scan(
        body, (z0.astype(jnp.float32), cache0), jnp.arange(num_steps)
    )
    return x_T, latents
