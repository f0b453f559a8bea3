"""The VFace 3-chunk sampler: CFG + TSG reconstruction branch + FSAI/FGATS.

Capability parity with ``DDIMSampler.sample → ddim_sampling →
p_sample_ddim_with_inverse`` (`/root/reference/REFace/ldm/models/diffusion/
ddim_w_inv.py:186-355, 621-738`), as one jitted `lax.scan`:

* 3-chunk batch per step, runtime order **[uncond, cond, recon]**
  (ddim_w_inv.py:654-662): chunk 0 = (x, uncond emb), chunk 1 =
  (x_uncond := x or src_start latents, swap cond), chunk 2 =
  (inverted target latents at t, target-reconstruction cond). The recon
  chunk is teacher-forced from the inversion stack every step; its only
  purpose is to populate attention q/k for TSG.
* CFG: ``e_t = e_uncond + s·(e_cond − e_uncond)`` and the recon branch's own
  ``e_recon ← e_recon + s·(e_recon − e_uncond)`` (ddim_w_inv.py:666-668) —
  computed for parity with the reference's (unused) recon x_prev.
* Injection: the reference re-registers attention hooks *every step* —
  all sites off, then input-blocks ON with ``flow_fix``
  (ddim_w_inv.py:300-308), i.e. a constant schedule. Here that is the static
  :class:`~vface_tpu.models.unet.InjectionSpec` threaded through the UNet;
  FGATS optical flow rides along as a traced array at the 64×64 token
  resolution.
* The inversion latent stack is consumed directly from HBM
  (`vface_tpu.samplers.inversion`), replacing per-step torch.load
  (ddim_w_inv.py:628).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from vface_tpu.models.ldm import VFaceModel
from vface_tpu.models.unet import InjectionSpec
from vface_tpu.samplers.ddim import ddim_step
from vface_tpu.utils.schedule import DDIMSchedule


def encoder_key_steps(
    num_steps: int, interval: int, dense_frac: float = 0.2
) -> jnp.ndarray:
    """Static key-step mask for encoder propagation ("Faster Diffusion",
    Li et al. 2023): encoder features change fastest early in the denoising
    trajectory (high noise), so key steps are DENSE for the first
    ``dense_frac`` of iterations and spaced ``interval`` apart afterwards.
    Index convention: scan iteration idx (0 = the first/most-noisy step)."""
    if interval <= 1:
        return jnp.ones((max(num_steps, 1),), bool)
    dense = max(1, int(round(dense_frac * num_steps)))
    keys = [(i <= dense) or ((i - dense) % interval == 0) for i in range(num_steps)]
    return jnp.asarray(keys)


def vface_sample(
    model: VFaceModel,
    params,
    x_T: jax.Array,
    cond: jax.Array,
    uncond: jax.Array,
    target_cond: jax.Array,
    inv_latents: jax.Array,
    inpaint_latent: jax.Array,
    mask_latent: jax.Array,
    injection: InjectionSpec,
    flow: Optional[jax.Array] = None,
    num_steps: int = 50,
    cfg_scale: float = 3.0,
    eta: float = 0.0,
    src_start: Optional[jax.Array] = None,
    rng: Optional[jax.Array] = None,
    encoder_interval: int = 1,
    drop_recon_chunk: bool = False,
    fgats_prev: Optional[dict] = None,
    fgats_flow0: Optional[jax.Array] = None,
    return_fgats_carry: bool = False,
    flow_pair_mask: Optional[jax.Array] = None,
):
    """Run the hooked 3-chunk sampling loop.

    x_T: (F, h, w, 4) start latents — the inversion stack's last entry
    (t=961 for S=50), per `scripts/VFace_inference_batch.py:541`.
    inv_latents: (S, F, h, w, 4) from :func:`ddim_invert` (same S).
    flow: (F-1, Hq, Wq, 2) pixel flow at the 64×64 token grid or None.
    Returns (z_0, pred_x0 trajectory) — plus the per-step fgats carry stack
    when ``return_fgats_carry`` (see below).

    Cross-window FGATS carry (beyond the reference, whose 6-frame windows are
    smoothed independently — SURVEY §5): ``fgats_prev`` is the PREVIOUS
    window's per-step carry {site: {"q": (S, 1, N, D), "k": ...}} returned by
    its own ``return_fgats_carry=True`` run, and ``fgats_flow0``
    (1, Hq, Wq, 2) maps this window's frame-0 pixels back to the previous
    window's last frame; frame 0's FGATS blend then chains across the window
    boundary instead of passing through unchanged.
    """
    sch = DDIMSchedule.create(model.schedule, num_steps, eta=eta)
    num_steps = sch.num_steps  # table may exceed the request (non-divisor S)
    f = x_T.shape[0]
    ts = jnp.asarray(sch.timesteps)
    a = jnp.asarray(sch.alphas)
    a_prev = jnp.asarray(sch.alphas_prev)
    s1m = jnp.asarray(sch.sqrt_one_minus_alphas)
    sig = jnp.asarray(sch.sigmas)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    extra = jnp.concatenate([inpaint_latent, mask_latent], axis=-1)
    # The recon (TSG) chunk is inert in the reference's active runtime: the
    # fusion donor is chunk 0 for every mode (pnp_utils.py:92-200 — chunk 2
    # only RECEIVES fusion), and e_t_recon / x_prev_recon are discarded
    # (ddim_w_inv.py:668, 705-710 — never returned). Dropping it is therefore
    # bit-identical for chunks 0/1 and removes a third of the sampling
    # compute (verified by test_recon_chunk_is_dead_compute). The fusion
    # config must keep the 3-chunk op semantics on the 2-chunk batch.
    if drop_recon_chunk:
        injection = dataclasses.replace(
            injection,
            input_blocks=dataclasses.replace(injection.input_blocks, two_chunk_replace=False),
            middle=dataclasses.replace(injection.middle, two_chunk_replace=False),
            output_blocks=dataclasses.replace(injection.output_blocks, two_chunk_replace=False),
            chunks=2,
        )
        c_in = jnp.concatenate([uncond, cond], axis=0)
    else:
        c_in = jnp.concatenate([uncond, cond, target_cond], axis=0)

    def unet_inputs(x, index):
        t = jnp.full((f,), ts[index], dtype=jnp.int32)
        x_u = x if src_start is None else src_start
        x9 = jnp.concatenate([x, extra], axis=-1)
        xu9 = jnp.concatenate([x_u, extra], axis=-1)
        if drop_recon_chunk:
            x_in = jnp.concatenate([x9, xu9], axis=0)
            t_in = jnp.concatenate([t, t], axis=0)
        else:
            inv9 = jnp.concatenate([inv_latents[index], extra], axis=-1)
            x_in = jnp.concatenate([x9, xu9, inv9], axis=0)
            t_in = jnp.concatenate([t, t, t], axis=0)
        return x_in, t_in

    use_cache = encoder_interval > 1
    key_mask = encoder_key_steps(num_steps, encoder_interval)
    use_carry = fgats_prev is not None or return_fgats_carry
    use_pack = use_carry or flow_pair_mask is not None

    def step_flow(idx):
        """Per-step flow payload: bare array, or a FlowPack with the previous
        window's step-idx carry (scan iteration order matches across windows
        — both run the same descending-t schedule) and/or the window-packing
        pair mask."""
        if not use_pack:
            return flow
        from vface_tpu.ops.attention import FlowPack

        prev = None
        if fgats_prev is not None:
            prev = jax.tree_util.tree_map(lambda s: s[idx], fgats_prev)
        return FlowPack(
            flow=flow, prev=prev, flow0=fgats_flow0, pair_mask=flow_pair_mask
        )

    def eps_full(x_in, t_in, _cache, fl):
        return model.apply_model(
            params, x_in, t_in, c_in, flow=fl, injection=injection,
            return_encoder_cache=True, return_fgats_carry=return_fgats_carry,
        )

    def eps_cached(x_in, t_in, cache, fl):
        return model.apply_model(
            params, x_in, t_in, c_in, flow=fl, injection=injection,
            encoder_cache=cache, return_encoder_cache=True,
            return_fgats_carry=return_fgats_carry,
        )

    def body(carry, idx):
        x, key, cache = carry
        index = num_steps - 1 - idx
        x_in, t_in = unet_inputs(x, index)
        fl = step_flow(idx)
        carry_out = ()
        if use_cache:
            # encoder propagation: full encoder on key steps only, denser
            # early ("Faster Diffusion" — see encoder_key_steps)
            is_key = key_mask[idx]
            out = jax.lax.cond(is_key, eps_full, eps_cached, x_in, t_in, cache, fl)
            if return_fgats_carry:
                eps, cache, carry_out = out
            else:
                eps, cache = out
        elif return_fgats_carry:
            eps, carry_out = model.apply_model(
                params, x_in, t_in, c_in, flow=fl, injection=injection,
                return_fgats_carry=True,
            )
        else:
            eps = model.apply_model(params, x_in, t_in, c_in, flow=fl, injection=injection)
        if drop_recon_chunk:
            e_uncond, e_cond = jnp.split(eps, 2, axis=0)
        else:
            e_uncond, e_cond, _e_recon = jnp.split(eps, 3, axis=0)
        e_t = e_uncond + cfg_scale * (e_cond - e_uncond)
        if eta == 0.0:
            noise = None
        else:
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, x.shape, jnp.float32)
        x_prev, pred_x0 = ddim_step(
            x, e_t, a[index], a_prev[index], s1m[index], sig[index], noise
        )
        return (x_prev, key, cache), (pred_x0, carry_out)

    if use_cache:
        x_in0, t_in0 = unet_inputs(x_T.astype(jnp.float32), num_steps - 1)
        cache_shape = jax.eval_shape(lambda: eps_full(x_in0, t_in0, None, step_flow(0)))
        cache0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), cache_shape[1]
        )
    else:
        cache0 = ()
    (z0, _, _), (traj, carry_stack) = jax.lax.scan(
        body, (x_T.astype(jnp.float32), rng, cache0), jnp.arange(num_steps)
    )
    if return_fgats_carry:
        return z0, traj, carry_stack
    return z0, traj


def vface_sample_pipelined(
    model: VFaceModel,
    params,
    x_T: jax.Array,
    cond: jax.Array,
    uncond: jax.Array,
    inpaint_latent: jax.Array,
    mask_latent: jax.Array,
    injection: InjectionSpec,
    *,
    next_z0: jax.Array,
    next_cond: jax.Array,
    next_inpaint: jax.Array,
    next_mask: jax.Array,
    inversion_steps: int = 50,
    skip_last: int = 1,
    flow: Optional[jax.Array] = None,
    num_steps: int = 50,
    cfg_scale: float = 3.0,
    eta: float = 0.0,
    rng: Optional[jax.Array] = None,
    flow_pair_mask: Optional[jax.Array] = None,
):
    """Recon-free sampling of pack i fused with the DDIM inversion of pack i+1.

    Software pipelining for single-chip throughput: the sampling eval
    (2-chunk CFG, b=2F) and the next pack's inversion eval (1-chunk, hooks
    OFF — ddim_w_inv.py:389) are *independent* UNet forwards that would
    otherwise run as 2×``num_steps`` separate device programs per pack; here
    each scan step runs ONE b=(2F+G) eval with the inversion rows marked
    ``bystander`` in the fusion config (they neither donate nor receive
    FSAI/FGATS — bit-identical to a hook-free forward, pinned by
    test_pipelined_pack_bit_exact). The measured per-eval fixed cost
    (~40 ms at 512² on v5e) is paid once instead of twice per step.

    Semantics are exactly `vface_sample(drop_recon_chunk=True)` for pack i
    plus `ddim_invert(..., skip_last=skip_last)` for pack i+1:
    * sampling descends the DDIM timesteps (index = S-1-idx);
    * inversion ascends with the reference's custom alpha indexing
      (ddim_w_inv.py:442-449), frozen after its ``n_inv`` steps (the scan is
      as long as the sampling loop; n_inv = S_inv - skip_last ≤ S required);
    * the returned ``next_x_T`` equals ddim_invert's t=961 start code
      (VFace_inference_batch.py:541).

    Returns (z0, pred_x0 trajectory, next_x_T).
    """
    sch = DDIMSchedule.create(model.schedule, num_steps, eta=eta)
    num_steps = sch.num_steps
    sch_i = DDIMSchedule.create(model.schedule, inversion_steps)
    n_inv = sch_i.num_steps - skip_last
    if n_inv > num_steps:
        raise ValueError(
            f"pipelined pack needs inversion steps ({n_inv}) <= sampling steps "
            f"({num_steps}); use the sequential path instead"
        )
    f = x_T.shape[0]
    g = next_z0.shape[0]
    ts = jnp.asarray(sch.timesteps)
    a = jnp.asarray(sch.alphas)
    a_prev = jnp.asarray(sch.alphas_prev)
    s1m = jnp.asarray(sch.sqrt_one_minus_alphas)
    sig = jnp.asarray(sch.sigmas)
    ts_i = jnp.asarray(sch_i.timesteps)
    ia_next = jnp.asarray(sch_i.inv_alpha_next)
    ia_cur = jnp.asarray(sch_i.inv_alpha_cur)
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    extra = jnp.concatenate([inpaint_latent, mask_latent], axis=-1)
    extra_i = jnp.concatenate([next_inpaint, next_mask], axis=-1)

    if injection.conv_inject:
        # ResBlock conv injection splits the batch by inj.chunks alone and
        # has no bystander concept (it is also OFF in the active schedule,
        # ddim_w_inv.py:300-308) — use the sequential path for it.
        raise ValueError("pipelined packs do not support conv_inject")

    def mark(fc):
        return dataclasses.replace(fc, two_chunk_replace=False, bystander=g)

    injection = dataclasses.replace(
        injection,
        input_blocks=mark(injection.input_blocks),
        middle=mark(injection.middle),
        output_blocks=mark(injection.output_blocks),
        chunks=2,
    )
    c_in = jnp.concatenate([uncond, cond, next_cond], axis=0)

    use_pack = flow_pair_mask is not None

    def step_flow():
        if not use_pack:
            return flow
        from vface_tpu.ops.attention import FlowPack

        return FlowPack(flow=flow, pair_mask=flow_pair_mask)

    def body(carry, idx):
        x, key, xi = carry
        index = num_steps - 1 - idx
        t_s = jnp.full((f,), ts[index], dtype=jnp.int32)
        ii = jnp.minimum(idx, n_inv - 1)
        t_i = jnp.full((g,), ts_i[ii], dtype=jnp.int32)
        x9 = jnp.concatenate([x, extra], axis=-1)
        xi9 = jnp.concatenate([xi, extra_i], axis=-1)
        x_in = jnp.concatenate([x9, x9, xi9], axis=0)
        t_in = jnp.concatenate([t_s, t_s, t_i], axis=0)
        eps = model.apply_model(
            params, x_in, t_in, c_in, flow=step_flow(), injection=injection
        )
        e_uncond, e_cond, e_inv = eps[:f], eps[f : 2 * f], eps[2 * f :]
        e_t = e_uncond + cfg_scale * (e_cond - e_uncond)
        if eta == 0.0:
            noise = None
        else:
            key, sub = jax.random.split(key)
            noise = jax.random.normal(sub, x.shape, jnp.float32)
        x_prev, pred_x0 = ddim_step(
            x, e_t, a[index], a_prev[index], s1m[index], sig[index], noise
        )
        an, ac = ia_next[ii], ia_cur[ii]
        xi_next = (xi - jnp.sqrt(1.0 - ac) * e_inv) * jnp.sqrt(an / ac) + jnp.sqrt(
            1.0 - an
        ) * e_inv
        xi = jnp.where(idx < n_inv, xi_next, xi)
        return (x_prev, key, xi), pred_x0

    (z0, _, next_x_T), traj = jax.lax.scan(
        body,
        (x_T.astype(jnp.float32), rng, next_z0.astype(jnp.float32)),
        jnp.arange(num_steps),
    )
    return z0, traj, next_x_T
