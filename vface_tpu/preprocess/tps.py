"""Batched thin-plate-spline warp (training-time mask deformation, "decow").

Capability parity with `/root/reference/REFace/thinplatespline/`
(``TPS_coeffs``/``TPS`` batch.py:54-142, grid utils utils.py:13-43) used by
the CelebA training dataset's mask augmentation (celebA.py:83-135, 476-478):
solve the TPS system for control-point pairs, then evaluate the dense warp
grid — both as single batched linear-algebra calls (one (n+3)×(n+3) solve and
one big matmul per batch element; MXU-friendly, no per-point loops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _u(r2: jnp.ndarray) -> jnp.ndarray:
    """TPS radial basis U(r) = r² log r² (with U(0)=0)."""
    return jnp.where(r2 == 0, 0.0, r2 * jnp.log(jnp.maximum(r2, 1e-12)))


def tps_coefficients(src: jnp.ndarray, dst: jnp.ndarray):
    """Solve TPS mapping src control points → dst. src/dst: (B, N, 2) in [-1,1].

    Returns (w, a): w (B, N, 2) radial weights, a (B, 3, 2) affine part,
    matching TPS_coeffs (batch.py:54-100).
    """
    b, n, _ = src.shape
    d2 = jnp.sum((src[:, :, None, :] - src[:, None, :, :]) ** 2, axis=-1)
    k = _u(d2)  # (B, N, N)
    p = jnp.concatenate([jnp.ones((b, n, 1)), src], axis=-1)  # (B, N, 3)
    zeros = jnp.zeros((b, 3, 3))
    top = jnp.concatenate([k, p], axis=-1)  # (B, N, N+3)
    bot = jnp.concatenate([jnp.swapaxes(p, 1, 2), zeros], axis=-1)  # (B, 3, N+3)
    l = jnp.concatenate([top, bot], axis=1)  # (B, N+3, N+3)
    y = jnp.concatenate([dst, jnp.zeros((b, 3, 2))], axis=1)  # (B, N+3, 2)
    sol = jnp.linalg.solve(l, y)
    return sol[:, :n], sol[:, n:]


def tps_transform(points: jnp.ndarray, src: jnp.ndarray, w: jnp.ndarray, a: jnp.ndarray):
    """Evaluate the TPS at ``points`` (B, M, 2): affine + radial terms."""
    d2 = jnp.sum((points[:, :, None, :] - src[:, None, :, :]) ** 2, axis=-1)  # (B, M, N)
    rad = jnp.einsum("bmn,bnd->bmd", _u(d2), w)
    ones = jnp.ones(points.shape[:-1] + (1,))
    aff = jnp.einsum("bmk,bkd->bmd", jnp.concatenate([ones, points], axis=-1), a)
    return rad + aff


def tps_warp(img: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Warp img (B,H,W,C) so that dst control points land on src positions.

    Control points in normalised [-1, 1] coords (reference convention).
    Backward warp: for each output pixel, find its source location via the
    TPS fitted from dst→src, then bilinear-sample.
    """
    from vface_tpu.ops.warp import grid_sample

    b, h, w_, c = img.shape
    wgt, aff = tps_coefficients(dst, src)
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w_)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    pts = jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)[None]
    pts = jnp.broadcast_to(pts, (b, h * w_, 2))
    mapped = tps_transform(pts, dst, wgt, aff)  # (B, HW, 2) in [-1,1]
    px = (mapped[..., 0] + 1.0) * 0.5 * (w_ - 1)
    py = (mapped[..., 1] + 1.0) * 0.5 * (h - 1)
    coords = jnp.stack([px, py], axis=-1).reshape(b, h, w_, 2)
    return grid_sample(img, coords)
