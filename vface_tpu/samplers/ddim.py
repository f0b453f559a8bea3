"""DDIM sampling as a single jitted `lax.scan` — the REFace image sampler.

Capability parity with `/root/reference/REFace/ldm/models/diffusion/ddim.py`
(class DDIMSampler: `sample` :96→142, `p_sample_ddim` :324, and the train-time
`sample_train`/`p_sample_ddim_train` used by `p_losses_face`), redesigned for
XLA: the whole 50-step loop is one `lax.scan` whose body closes over the
static schedule tables; CFG's 2-chunk batch is a batch-dim concat traced once.

Update rule (p_sample_ddim):
    e_t     = e_uncond + scale * (e_cond - e_uncond)
    pred_x0 = (x - sqrt(1 - a_t) * e_t) / sqrt(a_t)
    dir_xt  = sqrt(1 - a_prev - sigma^2) * e_t
    x_prev  = sqrt(a_prev) * pred_x0 + dir_xt + sigma * noise
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vface_tpu.models.ldm import VFaceModel
from vface_tpu.utils.schedule import DDIMSchedule


def _tables(model: VFaceModel, num_steps: int, eta: float) -> DDIMSchedule:
    return DDIMSchedule.create(model.schedule, num_steps, eta=eta)


def ddim_step(x, e_t, a_t, a_prev, sqrt_1m_at, sigma, noise):
    """One DDIM update in float32 (reference ddim.py:324-377 math)."""
    pred_x0 = (x - sqrt_1m_at * e_t) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(jnp.clip(1.0 - a_prev - sigma**2, 0.0)) * e_t
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma * noise
    return x_prev, pred_x0


def ddim_sample(
    model: VFaceModel,
    params,
    x_T: jax.Array,
    cond: jax.Array,
    uncond: jax.Array,
    inpaint_latent: jax.Array,
    mask_latent: jax.Array,
    num_steps: int = 50,
    cfg_scale: float = 3.0,
    eta: float = 0.0,
    rng: Optional[jax.Array] = None,
):
    """Sample z_0 from noise x_T. All args are device arrays; jit the caller.

    inpaint_latent (B,h,w,4) and mask_latent (B,h,w,1) are the fixed
    conditioning channels re-concatenated each step (ddim.py's
    test_model_kwargs path).
    """
    sch = _tables(model, num_steps, eta)
    num_steps = sch.num_steps  # table may exceed the request (non-divisor S)
    b = x_T.shape[0]
    ts = jnp.asarray(sch.timesteps)
    a = jnp.asarray(sch.alphas)
    a_prev = jnp.asarray(sch.alphas_prev)
    s1m = jnp.asarray(sch.sqrt_one_minus_alphas)
    sig = jnp.asarray(sch.sigmas)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    extra = jnp.concatenate([inpaint_latent, mask_latent], axis=-1)
    c_in = jnp.concatenate([uncond, cond], axis=0)

    def body(carry, idx):
        x, key = carry
        index = num_steps - 1 - idx  # descending through the table
        t = jnp.full((b,), ts[index], dtype=jnp.int32)
        x9 = jnp.concatenate([x, extra], axis=-1)
        x_in = jnp.concatenate([x9, x9], axis=0)
        t_in = jnp.concatenate([t, t], axis=0)
        eps = model.apply_model(params, x_in, t_in, c_in)
        e_uncond, e_cond = jnp.split(eps, 2, axis=0)
        e_t = e_uncond + cfg_scale * (e_cond - e_uncond)
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape, jnp.float32)
        x_prev, pred_x0 = ddim_step(x, e_t, a[index], a_prev[index], s1m[index], sig[index], noise)
        return (x_prev, key), pred_x0

    (x0, _), pred_x0s = jax.lax.scan(body, (x_T.astype(jnp.float32), rng), jnp.arange(num_steps))
    return x0, pred_x0s


def ddim_sample_train(
    model: VFaceModel,
    params,
    x_start_noisy: jax.Array,
    t_sequences: jax.Array,
    cond: jax.Array,
    inpaint_latent: jax.Array,
    mask_latent: jax.Array,
):
    """Train-time short reconstruction (ddim.py sample_train / ddpm.py:1696-1729).

    ``t_sequences`` (S, B) int32: per-sample descending timestep chains
    (ddim_w_inv.py:826-858 builds random per-sample sequences). Differentiable —
    used inside `p_losses_face`; returns every step's pred_x0 (S, B, h, w, 4)
    so the loss can decode each.
    """
    s_steps, b = t_sequences.shape
    acp = jnp.asarray(model.schedule.alphas_cumprod)
    extra = jnp.concatenate([inpaint_latent, mask_latent], axis=-1)

    def body(x, step):
        t_cur, t_next = step  # (B,), (B,) — t_next < t_cur (descending)
        a_t = acp[t_cur][:, None, None, None]
        a_prev = jnp.where(t_next[:, None, None, None] >= 0, acp[jnp.maximum(t_next, 0)][:, None, None, None], 1.0)
        x9 = jnp.concatenate([x, extra], axis=-1)
        e_t = model.apply_model(params, x9, t_cur, cond)
        pred_x0 = (x - jnp.sqrt(1.0 - a_t) * e_t) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(jnp.clip(1.0 - a_prev, 0.0)) * e_t
        x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt
        return x_prev, pred_x0

    t_cur = t_sequences
    t_next = jnp.concatenate([t_sequences[1:], -jnp.ones((1, b), t_sequences.dtype)], axis=0)
    x_final, pred_x0s = jax.lax.scan(body, x_start_noisy.astype(jnp.float32), (t_cur, t_next))
    return x_final, pred_x0s
