"""PLMS sampler (pseudo linear multistep), jitted `lax.scan` form.

Capability parity with `/root/reference/REFace/ldm/models/diffusion/plms.py`
(selected by ``--plms`` in the inference drivers,
`scripts/VFace_inference_batch.py:870-873`): Adams–Bashforth multistep over
the ε-predictions with the standard PLMS warm-up —

    k=0 : Heun — step with e_t, re-evaluate at x', use (e_t + e')/2
    k=1 : (3 e_t − e_{−1}) / 2
    k=2 : (23 e_t − 16 e_{−1} + 5 e_{−2}) / 12
    k≥3 : (55 e_t − 59 e_{−1} + 37 e_{−2} − 9 e_{−3}) / 24

The old-ε deque of the reference becomes a fixed (3, ...) ring buffer in the
scan carry (static shapes for XLA).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vface_tpu.models.ldm import VFaceModel
from vface_tpu.utils.schedule import DDIMSchedule


def plms_sample(
    model: VFaceModel,
    params,
    x_T: jax.Array,
    cond: jax.Array,
    uncond: jax.Array,
    inpaint_latent: jax.Array,
    mask_latent: jax.Array,
    num_steps: int = 50,
    cfg_scale: float = 3.0,
):
    sch = DDIMSchedule.create(model.schedule, num_steps)
    num_steps = sch.num_steps  # table may exceed the request (non-divisor S)
    b = x_T.shape[0]
    ts = jnp.asarray(sch.timesteps)
    a = jnp.asarray(sch.alphas)
    a_prev_tab = jnp.asarray(sch.alphas_prev)
    s1m = jnp.asarray(sch.sqrt_one_minus_alphas)
    extra = jnp.concatenate([inpaint_latent, mask_latent], axis=-1)
    c_in = jnp.concatenate([uncond, cond], axis=0)

    def eps_at(x, t):
        x9 = jnp.concatenate([x, extra], axis=-1)
        eps = model.apply_model(
            params,
            jnp.concatenate([x9, x9], axis=0),
            jnp.concatenate([t, t], axis=0),
            c_in,
        )
        e_u, e_c = jnp.split(eps, 2, axis=0)
        return e_u + cfg_scale * (e_c - e_u)

    def x_prev_from(x, e, index):
        pred_x0 = (x - s1m[index] * e) / jnp.sqrt(a[index])
        dir_xt = jnp.sqrt(jnp.clip(1.0 - a_prev_tab[index], 0.0)) * e
        return jnp.sqrt(a_prev_tab[index]) * pred_x0 + dir_xt, pred_x0

    def body(carry, idx):
        x, old, count = carry  # old: (3, B, h, w, 4) ring, newest first
        index = num_steps - 1 - idx
        t = jnp.full((b,), ts[index], dtype=jnp.int32)
        e_t = eps_at(x, t)

        # Heun warm-up candidate
        x1, _ = x_prev_from(x, e_t, index)
        t_next_idx = jnp.maximum(index - 1, 0)
        t_next = jnp.full((b,), ts[t_next_idx], dtype=jnp.int32)
        e_next = eps_at(x1, t_next)
        e_heun = 0.5 * (e_t + e_next)

        e_ab1 = (3.0 * e_t - old[0]) / 2.0
        e_ab2 = (23.0 * e_t - 16.0 * old[0] + 5.0 * old[1]) / 12.0
        e_ab3 = (55.0 * e_t - 59.0 * old[0] + 37.0 * old[1] - 9.0 * old[2]) / 24.0
        e_prime = jnp.select(
            [count == 0, count == 1, count == 2],
            [e_heun, e_ab1, e_ab2],
            e_ab3,
        )
        x_prev, pred_x0 = x_prev_from(x, e_prime, index)
        old = jnp.concatenate([e_t[None], old[:2]], axis=0)
        return (x_prev, old, count + 1), pred_x0

    old0 = jnp.zeros((3,) + x_T.shape, jnp.float32)
    (z0, _, _), traj = jax.lax.scan(
        body, (x_T.astype(jnp.float32), old0, jnp.int32(0)), jnp.arange(num_steps)
    )
    return z0, traj
