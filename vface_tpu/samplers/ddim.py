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
    """One DDIM update in float32 (reference ddim.py:324-377 math).

    ``noise=None`` skips the stochastic term — bit-exact at eta=0, where the
    sigma table is exactly zero and ``0 * noise == 0`` for any finite noise;
    skipping also removes the per-step threefry RNG from the scan body."""
    pred_x0 = (x - sqrt_1m_at * e_t) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(jnp.clip(1.0 - a_prev - sigma**2, 0.0)) * e_t
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt
    if noise is not None:
        x_prev = x_prev + sigma * noise
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
        if eta == 0.0:
            noise = None
        else:
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, x.shape, jnp.float32)
        x_prev, pred_x0 = ddim_step(x, e_t, a[index], a_prev[index], s1m[index], sig[index], noise)
        return (x_prev, key), pred_x0

    (x0, _), pred_x0s = jax.lax.scan(body, (x_T.astype(jnp.float32), rng), jnp.arange(num_steps))
    return x0, pred_x0s


def train_recon_timesteps(t_start: int, num_steps: int):
    """The reference's train-time reconstruction chain, exactly
    (ddim.py:455-478 runtime): ``skip = (t-1) // S`` (min 1),
    ``seq = range(1, t-1, skip)`` truncated to ``min(len, S)`` then flipped to
    descending. For the shipped operating point (t=999, S=4) this yields
    [748, 499, 250, 1] — NOT a uniform grid from t."""
    import numpy as np

    skip = max((t_start - 1) // num_steps, 1)
    seq = list(range(1, t_start - 1, skip))[: num_steps]
    return np.asarray(seq[::-1], dtype=np.int32)


def ddim_sample_train(
    model: VFaceModel,
    params,
    x_start_noisy: jax.Array,
    t_start: int,
    num_steps: int,
    cond: jax.Array,
    inpaint_latent: jax.Array,
    mask_latent: jax.Array,
    log_every_t: int = 100,
):
    """Train-time short reconstruction, runtime-exact vs the reference
    (ddim.py ``sample_train``/``ddim_sampling_train``/``p_sample_ddim_train``
    :378-560, called from ``p_losses_face`` ddpm.py:1702-1729).

    Runtime semantics reproduced here (each a quirk the loss depends on):

    * the model is evaluated at the per-step t from
      :func:`train_recon_timesteps`, but the DDIM update coefficients come
      from the UNIFORM ``make_schedule(S)`` table indexed by loop position
      (``index = S-1-i``, ddim.py:550-556) — the two grids differ by a few
      steps and the reference never reconciles them;
    * no CFG: ``unconditional_conditioning=None`` at ddpm.py:1725 short-cuts
      to a single-chunk model call (ddim.py:532-534);
    * eta = 0 (ddpm.py:1707);
    * the returned intermediates list starts with the NOISY START LATENT
      itself (``intermediates = {'pred_x0': [img]}``, ddim.py:482) and then
      logs pred_x0 at ``index % log_every_t == 0 or index == S-1``
      (ddim.py:514-516) — for S=4 that is [x_T, pred_x0@i0, pred_x0@i3].
      ``p_losses_face`` decodes and penalises EVERY entry, including the
      noise decode (ddpm.py:1736-1738).

    Differentiable; returns ``(z_final, intermediates)`` with intermediates
    stacked (K, B, h, w, 4).
    """
    import numpy as np

    seq = train_recon_timesteps(t_start, num_steps)
    total = len(seq)
    sch = model.schedule
    acp = np.asarray(sch.alphas_cumprod)
    # make_schedule(S) uniform table (util.py:46-63): range(0, T, T//S) + 1
    ddim_ts = np.arange(0, sch.num_timesteps, sch.num_timesteps // num_steps) + 1
    a_tab = acp[ddim_ts]
    a_prev_tab = np.concatenate([[acp[0]], acp[ddim_ts[:-1]]])

    b = x_start_noisy.shape[0]
    extra = jnp.concatenate([inpaint_latent, mask_latent], axis=-1)
    x = x_start_noisy.astype(jnp.float32)
    inters = [x]
    for i in range(total):
        index = total - 1 - i
        t = jnp.full((b,), int(seq[i]), jnp.int32)
        a_t = jnp.float32(a_tab[index])
        a_prev = jnp.float32(a_prev_tab[index])
        x9 = jnp.concatenate([x, extra], axis=-1)
        e_t = model.apply_model(params, x9, t, cond)
        pred_x0 = (x - jnp.sqrt(1.0 - a_t) * e_t) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(jnp.clip(1.0 - a_prev, 0.0)) * e_t
        x = jnp.sqrt(a_prev) * pred_x0 + dir_xt
        if index % log_every_t == 0 or index == total - 1:
            inters.append(pred_x0)
    return x, jnp.stack(inters)
