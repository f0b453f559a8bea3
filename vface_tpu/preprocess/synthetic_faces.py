"""Procedural face renderer with iBUG-68 landmark ground truth.

Supervision source for distilling `LandmarkNet` when no dlib teacher is
available in-environment (the reference's landmarker is dlib's ERT cascade,
`/root/reference/REFace/src/utils/alignmengt.py:39-81`; its training data is
iBUG-300W). Faces are rendered as parameterised ellipse/line compositions in
pure numpy — skin, brows, eyes, nose, mouth — with randomized pose, scale,
anisotropy, colors and background, and the exact 68-point layout the
geometric consumers expect:

  0-16 jaw · 17-21 / 22-26 brows · 27-35 nose · 36-41 / 42-47 eyes ·
  48-59 outer lip · 60-67 inner lip

The eye/mouth points drive `preprocess.align.compute_quad` (the FFHQ-style
quad of alignmengt.py:148-178), so a net distilled on these produces stable,
geometry-consistent crops.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def canonical_landmarks() -> np.ndarray:
    """(68, 2) landmark layout in canonical face coords ([-1, 1] box,
    +x right, +y down)."""
    pts = np.zeros((68, 2), np.float32)
    # jaw 0-16: lower face arc, chin at (0, 1)
    th = np.linspace(0.0, np.pi, 17)
    pts[0:17, 0] = -0.9 * np.cos(th)
    pts[0:17, 1] = 0.1 + 0.9 * np.sin(th)
    # brows 17-21 (image-left) / 22-26 (image-right), slight arc
    bx = np.linspace(-0.62, -0.18, 5)
    pts[17:22, 0] = bx
    pts[17:22, 1] = -0.48 - 0.06 * np.sin(np.linspace(0, np.pi, 5))
    pts[22:27, 0] = -bx[::-1]
    pts[22:27, 1] = pts[17:22, 1][::-1]
    # nose bridge 27-30 + nostril line 31-35
    pts[27:31, 0] = 0.0
    pts[27:31, 1] = np.linspace(-0.35, 0.12, 4)
    pts[31:36, 0] = np.linspace(-0.14, 0.14, 5)
    pts[31:36, 1] = 0.22
    # eyes 36-41 (left in image; 36 outer corner) / 42-47 (42 inner corner)
    ex, ey, rx, ry = 0.40, -0.26, 0.15, 0.07
    ang = np.deg2rad([180.0, 135.0, 45.0, 0.0, -45.0, -135.0])
    eye = np.stack([rx * np.cos(ang), -ry * np.sin(ang)], axis=-1)
    pts[36:42] = eye + (-ex, ey)
    pts[42:48] = eye + (ex, ey)
    # mouth: outer 48-59 (48 left corner, ccw over the top), inner 60-67
    mx, my, mrx, mry = 0.0, 0.55, 0.30, 0.13
    ang12 = np.deg2rad(180.0 - np.arange(12) * 30.0)
    pts[48:60, 0] = mx + mrx * np.cos(ang12)
    pts[48:60, 1] = my - mry * np.sin(ang12)
    ang8 = np.deg2rad(180.0 - np.arange(8) * 45.0)
    pts[60:68, 0] = mx + 0.6 * mrx * np.cos(ang8)
    pts[60:68, 1] = my - 0.45 * mry * np.sin(ang8)
    return pts


def _ellipse(xx, yy, cx, cy, rx, ry, cos_t=1.0, sin_t=0.0):
    dx, dy = xx - cx, yy - cy
    u = dx * cos_t + dy * sin_t
    v = -dx * sin_t + dy * cos_t
    return (u / max(rx, 1e-6)) ** 2 + (v / max(ry, 1e-6)) ** 2 <= 1.0


def render_face(
    rng: np.random.Generator, size: int = 128
) -> Tuple[np.ndarray, np.ndarray]:
    """One randomized face → (image01 (S, S, 3), landmarks (68, 2) px)."""
    s = size
    yy, xx = np.meshgrid(np.arange(s, dtype=np.float32),
                         np.arange(s, dtype=np.float32), indexing="ij")
    # pose: center, half-size, rotation, anisotropy
    scale = rng.uniform(0.22, 0.42) * s
    cx = rng.uniform(0.35, 0.65) * s
    cy = rng.uniform(0.35, 0.65) * s
    theta = rng.uniform(-0.35, 0.35)
    aspect = rng.uniform(0.85, 1.15)
    ct, st = np.cos(theta), np.sin(theta)
    rot = np.asarray([[ct, -st], [st, ct]], np.float32)

    def to_px(pts_canon):
        p = pts_canon * np.asarray([scale * aspect, scale], np.float32)
        return p @ rot.T + np.asarray([cx, cy], np.float32)

    lm = to_px(canonical_landmarks())

    # colors: skin brighter than background; features darker than skin
    bg = rng.uniform(0.0, 1.0, (3,)).astype(np.float32)
    skin = np.clip(bg + rng.uniform(0.25, 0.6) * rng.choice([-1.0, 1.0]), 0.05, 0.95)
    dark = np.clip(skin - rng.uniform(0.25, 0.5), 0.0, 1.0)
    lip = np.clip(skin - rng.uniform(0.1, 0.35), 0.0, 1.0)

    img = np.empty((s, s, 3), np.float32)
    img[:] = bg
    img += rng.normal(0, 0.03, img.shape).astype(np.float32)  # texture noise

    # head: ellipse containing the jaw arc and forehead
    head_cy, head_cx = to_px(np.asarray([[0.0, 0.05]], np.float32))[0][::-1]
    head = _ellipse(xx, yy, head_cx, head_cy, 0.95 * scale * aspect,
                    1.05 * scale, ct, st)
    img[head] = skin

    def paint(center_canon, rx_c, ry_c, color):
        c = to_px(np.asarray([center_canon], np.float32))[0]
        m = _ellipse(xx, yy, c[0], c[1], rx_c * scale * aspect, ry_c * scale, ct, st)
        img[m] = color

    paint((-0.40, -0.26), 0.15, 0.07, dark)   # eyes
    paint((0.40, -0.26), 0.15, 0.07, dark)
    paint((-0.40, -0.50), 0.23, 0.035, dark)  # brows
    paint((0.40, -0.50), 0.23, 0.035, dark)
    paint((0.0, 0.55), 0.30, 0.13, lip)       # mouth
    paint((0.0, 0.0), 0.05, 0.22, np.clip(skin - 0.12, 0, 1))  # nose ridge
    paint((0.0, 0.22), 0.14, 0.04, np.clip(skin - 0.18, 0, 1))  # nostril line

    img += rng.normal(0, 0.02, img.shape).astype(np.float32)
    return np.clip(img, 0.0, 1.0), lm.astype(np.float32)


def render_batch(
    rng: np.random.Generator, n: int, size: int = 128
) -> Tuple[np.ndarray, np.ndarray]:
    imgs, lms = zip(*(render_face(rng, size) for _ in range(n)))
    return np.stack(imgs), np.stack(lms)


def render_pan_sequence(
    rng: np.random.Generator, n_frames: int, size: int = 128, step_px: float = 1.0
) -> Tuple[np.ndarray, np.ndarray]:
    """One face translated ``step_px`` per frame — the crop-stability probe
    (quad jitter between adjacent frames must track the pan, < 2 px)."""
    img0, lm0 = render_face(rng, size)
    imgs, lms = [img0], [lm0]
    for i in range(1, n_frames):
        shift = int(round(i * step_px))
        img = np.roll(img0, shift, axis=1)
        imgs.append(img)
        lm = lm0.copy()
        lm[:, 0] += shift
        lms.append(lm)
    return np.stack(imgs), np.stack(lms)
