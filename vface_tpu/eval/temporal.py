"""Temporal-consistency metrics for swapped videos (beyond the reference).

The reference computes no temporal metrics in-repo (SURVEY §4: the video
bench is inspected visually). These are the standard video face-swap
temporal measures, batched on device:

* :func:`warp_error` — mean photometric error between frame t and frame t−1
  warped by the (precomputed) optical flow: lower = smoother video.
* :func:`tl_id` / :func:`tg_id` — temporally-local / temporally-global ID
  consistency (cosine similarity of ArcFace embeddings between consecutive
  frames / against the sequence mean), as used in the video-face-swap
  literature to quantify identity flicker.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vface_tpu.models.arcface import IRSE50
from vface_tpu.ops.warp import warp_by_flow


def warp_error(frames01: jax.Array, flow: jax.Array, mask: jax.Array | None = None) -> float:
    """frames01 (F,H,W,3); flow (F-1,H,W,2) mapping frame i+1 back to i."""
    warped_prev = warp_by_flow(frames01[:-1], flow)
    err = jnp.abs(frames01[1:] - warped_prev)
    if mask is not None:
        err = err * mask[1:]
        denom = jnp.sum(mask[1:]) * frames01.shape[-1] + 1e-8
        return float(jnp.sum(err) / denom)
    return float(jnp.mean(err))


def _embeddings(params, frames01, model: IRSE50 | None = None) -> jax.Array:
    from vface_tpu.models.arcface import arcface_preprocess

    model = model or IRSE50()
    e = model.apply({"params": params}, arcface_preprocess(frames01))
    return e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-8)


def tl_id(params, frames01, model: IRSE50 | None = None) -> float:
    """Temporally-local ID: mean cosine between consecutive-frame embeddings."""
    e = _embeddings(params, frames01, model)
    return float(jnp.mean(jnp.sum(e[1:] * e[:-1], axis=-1)))


def tg_id(params, frames01, model: IRSE50 | None = None) -> float:
    """Temporally-global ID: mean cosine of each frame against the mean embedding."""
    e = _embeddings(params, frames01, model)
    mean = e.mean(axis=0, keepdims=True)
    mean = mean / (jnp.linalg.norm(mean, axis=-1, keepdims=True) + 1e-8)
    return float(jnp.mean(jnp.sum(e * mean, axis=-1)))


def evaluate_temporal(
    params_arcface,
    frames01: np.ndarray,
    flow: np.ndarray | None = None,
    model: IRSE50 | None = None,
) -> dict:
    frames01 = jnp.asarray(frames01)
    out = {
        "tl_id": tl_id(params_arcface, frames01, model),
        "tg_id": tg_id(params_arcface, frames01, model),
    }
    if flow is not None:
        out["warp_error"] = warp_error(frames01, jnp.asarray(flow))
    return out
