"""FFHQ/STIT-style face alignment as batched XLA — quads, crops, paste-back.

Capability parity with `/root/reference/REFace/src/utils/alignmengt.py`:

* :func:`compute_quad` — the oriented crop rectangle from 68 landmarks
  (alignmengt.py:148-178): eye/mouth geometry → (c, x, y) → quad
  [c−x−y, c−x+y, c+x+y, c+x−y], with the ``scale`` factor.
* :func:`quad_crop` — PIL's ``Image.transform(QUAD, BILINEAR)`` semantics
  (alignmengt.py:145) as one batched bilinear gather: the quad maps the four
  output corners to source pixels; interior via bilinear interpolation of the
  quad (PIL's QUAD transform is exactly bilinear in the corner coordinates,
  including the reference's ``quad + 0.5`` offset).
* :func:`perspective_coefficients` — the 8-coeff least-squares inverse
  transform for paste-back (alignmengt.py:266-276).
* :func:`perspective_warp` — PIL ``Image.transform(PERSPECTIVE)`` semantics,
  batched (used by the paste-back at
  `scripts/VFace_inference_batch.py:625-636`).
* :func:`paste_back` — alpha-composite the swapped crop into the original
  frame through the inverse transform with a soft mask.

Unlike the reference (PIL per frame on host, hot CPU loop #1 in SURVEY §3.1),
every function here is shape-static, batched over frames, and jittable, so
alignment/paste-back run on-device overlapped with sampling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vface_tpu.ops.warp import grid_sample


def compute_quad(landmarks68: jnp.ndarray, scale: float = 1.0):
    """(..., 68, 2) landmarks (x, y) → quad (..., 4, 2) and qsize (...).

    Quad vertex order matches the reference: [c−x−y, c−x+y, c+x+y, c+x−y]
    = (top-left, bottom-left, bottom-right, top-right) in source coords.
    """
    lm = landmarks68.astype(jnp.float32)
    eye_left = jnp.mean(lm[..., 36:42, :], axis=-2)
    eye_right = jnp.mean(lm[..., 42:48, :], axis=-2)
    eye_avg = (eye_left + eye_right) * 0.5
    eye_to_eye = eye_right - eye_left
    mouth_avg = (lm[..., 48, :] + lm[..., 54, :]) * 0.5
    eye_to_mouth = mouth_avg - eye_avg

    # x = eye_to_eye - flipud(eye_to_mouth) * [-1, 1]  (rotate e2m by 90°)
    rot = jnp.stack([eye_to_mouth[..., 1], -eye_to_mouth[..., 0]], axis=-1) * jnp.asarray([-1.0, 1.0])
    x = eye_to_eye - rot
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    extent = jnp.maximum(
        jnp.linalg.norm(eye_to_eye, axis=-1) * 2.0,
        jnp.linalg.norm(eye_to_mouth, axis=-1) * 1.8,
    )
    x = x * extent[..., None] * scale
    y = jnp.stack([-x[..., 1], x[..., 0]], axis=-1)
    c = eye_avg + eye_to_mouth * 0.1
    quad = jnp.stack([c - x - y, c - x + y, c + x + y, c + x - y], axis=-2)
    qsize = jnp.linalg.norm(x, axis=-1) * 2.0
    return quad, qsize


def quad_crop(img: jnp.ndarray, quad: jnp.ndarray, size: int) -> jnp.ndarray:
    """Batched PIL QUAD transform: img (B,H,W,C), quad (B,4,2) → (B,size,size,C).

    Output pixel (u, v) in [0, size)² samples the bilinear interpolation of the
    quad corners (PIL QUAD semantics; the reference passes quad + 0.5 then PIL
    subtracts the half-pixel — net effect reproduced by sampling at the exact
    interpolated corner coordinates).
    """
    b = img.shape[0]
    u = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    v = (jnp.arange(size, dtype=jnp.float32) + 0.5) / size
    vv, uu = jnp.meshgrid(v, u, indexing="ij")  # (size, size): vv rows, uu cols
    # corners: 0=TL 1=BL 2=BR 3=TR (source coords of output corners)
    tl, bl, br, tr = quad[:, 0], quad[:, 1], quad[:, 2], quad[:, 3]
    top = tl[:, None, None, :] * (1 - uu)[None, :, :, None] + tr[:, None, None, :] * uu[None, :, :, None]
    bot = bl[:, None, None, :] * (1 - uu)[None, :, :, None] + br[:, None, None, :] * uu[None, :, :, None]
    coords = top * (1 - vv)[None, :, :, None] + bot * vv[None, :, :, None]
    return grid_sample(img, coords)


def perspective_coefficients(pa: np.ndarray, pb: np.ndarray) -> np.ndarray:
    """8-coeff perspective transform mapping pb → pa sampling coefficients.

    Least-squares solve identical to alignmengt.py:266-276: returns
    (a,b,c,d,e,f,g,h) with x_src = (a·x+b·y+c)/(g·x+h·y+1),
    y_src = (d·x+e·y+f)/(g·x+h·y+1). Host-side numpy (one 8×8 solve).
    """
    pa = np.asarray(pa, dtype=np.float64)
    pb = np.asarray(pb, dtype=np.float64)
    m = []
    for p1, p2 in zip(pa, pb):
        m.append([p1[0], p1[1], 1, 0, 0, 0, -p2[0] * p1[0], -p2[0] * p1[1]])
        m.append([0, 0, 0, p1[0], p1[1], 1, -p2[1] * p1[0], -p2[1] * p1[1]])
    a = np.asarray(m)
    bvec = pb.reshape(8)
    res, *_ = np.linalg.lstsq(a, bvec, rcond=None)
    return res.astype(np.float32)


def perspective_warp(img: jnp.ndarray, coeffs: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Batched PIL PERSPECTIVE transform: img (B,h,w,C), coeffs (B,8) → (B,out_h,out_w,C)."""
    xs = jnp.arange(out_w, dtype=jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    a, b_, c, d, e, f, g, h = [coeffs[:, i][:, None, None] for i in range(8)]
    den = g * xx[None] + h * yy[None] + 1.0
    sx = (a * xx[None] + b_ * yy[None] + c) / den
    sy = (d * xx[None] + e * yy[None] + f) / den
    coords = jnp.stack([sx, sy], axis=-1)
    return grid_sample(img, coords)


def paste_back(
    frame: jnp.ndarray,
    swapped_crop: jnp.ndarray,
    coeffs: jnp.ndarray,
    mask_crop: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Composite swapped 1024² (or 512²) crops back into full frames.

    frame (B,H,W,3) in [0,1]; swapped_crop (B,s,s,3); coeffs (B,8) mapping
    frame pixel → crop pixel (the inverse transform of
    VFace_inference_batch.py:625-636). mask_crop (B,s,s,1) optional soft
    validity mask in crop space (defaults to all-ones → quad region).
    """
    b, hh, ww, _ = frame.shape
    s = swapped_crop.shape[1]
    if mask_crop is None:
        mask_crop = jnp.ones((b, s, s, 1), frame.dtype)
    # one warp for crop+mask: the two perspective_warps share identical
    # sample coordinates, so concatenating channels halves the gather work
    # (TPU grid_sample is gather-bound — scripts/bench_glue_micro.py measured
    # paste_back at 520 ms/24 frames, ~40% of it the duplicate mask warp);
    # bit-identical taps and weights.
    nc = swapped_crop.shape[-1]
    both = perspective_warp(
        jnp.concatenate([swapped_crop, mask_crop.astype(swapped_crop.dtype)], axis=-1),
        coeffs, hh, ww,
    )
    warped, warped_mask = both[..., :nc], both[..., nc:]
    # points sampling outside the crop get zero weight
    xs = jnp.arange(ww, dtype=jnp.float32)
    ys = jnp.arange(hh, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    a, b_, c, d, e, f, g, h = [coeffs[:, i][:, None, None] for i in range(8)]
    den = g * xx[None] + h * yy[None] + 1.0
    sx = (a * xx[None] + b_ * yy[None] + c) / den
    sy = (d * xx[None] + e * yy[None] + f) / den
    inside = (
        (sx >= 0) & (sx <= s - 1) & (sy >= 0) & (sy <= s - 1)
    ).astype(frame.dtype)[..., None]
    alpha = warped_mask * inside
    return frame * (1.0 - alpha) + warped * alpha
