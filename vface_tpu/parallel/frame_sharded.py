"""Frame-parallel hooked sampling — the context-parallel analog of SURVEY §7.

The reference runs each 6-frame window on one GPU
(`/root/reference/REFace/scripts/VFace_inference_batch.py:193-670`); the
production multi-chip path here is window-parallel (independent windows over
the ``data`` axis, `pipelines/video_swap.py::swap_windows_batched`). This
module is the OTHER axis: ONE window's frames sharded over the mesh, for the
latency-bound case (few frames, many chips).

Everything inside the sampling step is frame-local except the FGATS blend
(`scripts/temporal_flow.py:223-237`), whose 1-frame dependency is satisfied
by a single ``ppermute`` halo (`ops.warp.align_by_flow_halo`), selected
statically via ``FusionConfig.flow_axis`` — no all-gather of the window, so
the per-step collective cost is one (Hq, Wq, D) frame over ICI regardless of
window size. Parity vs the unsharded sampler is pinned by
``tests/test_parallel.py::test_frame_sharded_sampling_matches_unsharded``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _with_flow_axis(injection, axis_name: str):
    """Flag every fusion site with the shard axis (static; hashable)."""
    return dataclasses.replace(
        injection,
        input_blocks=dataclasses.replace(injection.input_blocks, flow_axis=axis_name),
        middle=dataclasses.replace(injection.middle, flow_axis=axis_name),
        output_blocks=dataclasses.replace(injection.output_blocks, flow_axis=axis_name),
    )


def vface_sample_frame_sharded(
    model,
    params,
    x_T: jax.Array,
    cond: jax.Array,
    uncond: jax.Array,
    target_cond: jax.Array,
    inpaint_latent: jax.Array,
    mask_latent: jax.Array,
    injection,
    flow: jax.Array,
    mesh: Mesh,
    num_steps: int = 50,
    cfg_scale: float = 3.0,
    eta: float = 0.0,
    encoder_interval: int = 1,
    axis_name: str = "data",
    flow_pair_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Hooked 2-chunk CFG sampling with the window's F frames sharded over
    ``axis_name``; FGATS flow ON across shard boundaries.

    Args match :func:`vface_tpu.samplers.vface.vface_sample`
    (recon-free semantics, ``drop_recon_chunk=True``) with ``flow`` the usual
    (F-1, Hq, Wq, 2) pairwise layout and ``flow_pair_mask`` the usual (F-1,)
    window-packing mask; both are converted to the left-padded per-frame
    layout the halo blend uses. Returns z0 (F, h, w, 4), frame-sharded.
    """
    from vface_tpu.samplers import vface_sample

    n = mesh.shape[axis_name]
    f = x_T.shape[0]
    if f % n:
        raise ValueError(f"frames ({f}) must divide over the {axis_name} axis ({n})")
    if flow is None:
        raise ValueError("frame-sharded sampling is the flow-on path; pass flow")

    inj = _with_flow_axis(injection, axis_name)

    # (F-1,) pairwise → (F,) left-padded per-frame layout: slot i = pair
    # (i-1, i); global frame 0's slot is dead (mask 0 makes it identity).
    flow_pad = jnp.concatenate([jnp.zeros_like(flow[:1]), flow], axis=0)
    pm = jnp.ones((f - 1,), jnp.float32) if flow_pair_mask is None else flow_pair_mask
    pm_pad = jnp.concatenate([jnp.zeros((1,), jnp.float32), pm.astype(jnp.float32)])

    def local(params, x_T, cond, uncond, tarc, inpaint, maskl, flow_l, pm_l):
        dummy_inv = jnp.zeros((1,) + x_T.shape, x_T.dtype)
        z0, _ = vface_sample(
            model, params, x_T, cond, uncond, tarc, dummy_inv, inpaint, maskl,
            inj, flow=flow_l, num_steps=num_steps, cfg_scale=cfg_scale,
            eta=eta, encoder_interval=encoder_interval,
            drop_recon_chunk=True, flow_pair_mask=pm_l,
        )
        return z0

    from jax.experimental.shard_map import shard_map

    spec = P(axis_name)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), spec, spec, spec, spec, spec, spec, spec, spec),
        out_specs=spec,
        check_rep=False,
    )
    return fn(
        params, x_T, cond, uncond, target_cond,
        inpaint_latent, mask_latent, flow_pad, pm_pad,
    )
