"""Shipped LandmarkNet weights vs REAL photographs — the synthetic→real gate.

The v1 weights (distilled purely on the v1 cartoon renderer) failed on real
images, so the distillation renderer + net featurization were redesigned
(`vface_tpu.preprocess.synthetic_faces` v2, per-image-standardized
gray+gradient featurization in `LandmarkNet`).  These tests pin the result on
the reference's own example photos
(`/root/reference/REFace/examples/FaceSwap/Source/` — elon / will_smith /
yanlecun / oscar-isaac plus three MetFaces-style painted portraits), which the
reference feeds through dlib landmarks → FFHQ quad → crop
(`/root/reference/REFace/src/utils/alignmengt.py:39-178`).

Ground truth: hand-annotated face boxes, eye-line and mouth-line vertical
bands (loose, ±(band) px) recorded from visual inspection of each photo.  The
assertions are deliberately coarse — plausibility gates, not px-accuracy — so
they detect a broken synthetic→real transfer (eyes==mouth collapse, span
collapse, off-face predictions) without overfitting to one training run:

* predicted eye centers / mouth center fall inside the annotated bands;
* landmark cloud lands inside the (slightly inflated) face box;
* eyes sit ABOVE the mouth by a sane margin, left eye left of right eye;
* the FFHQ quad is finite and contains the eye/mouth annotation points;
* shift-equivariance: translating the photo moves predictions by ~the shift
  (the real-photo analog of the synthetic pan crop-stability test).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from vface_tpu.preprocess.landmarks import LandmarkNet, load_default_landmark_params

EXAMPLES = "/root/reference/REFace/examples/FaceSwap/Source"

# name -> (face box x0,y0,x1,y1, eye band (y_lo,y_hi), mouth band (y_lo,y_hi),
#          eye x range (x_lo,x_hi))  — hand-annotated, original pixel coords
ANNOTATIONS = {
    "elon.jpeg": ((200, 80, 470, 400), (160, 240), (255, 330), (225, 405)),
    "will_smith.jpeg": ((1700, 300, 3350, 2400), (1020, 1330), (1580, 1980), (2050, 2990)),
    "yanlecun.jpeg": ((370, 70, 520, 260), (105, 155), (175, 230), (385, 495)),
    "rs_1200x1200-220504122141-1200-oscar-isaac-moon-knight.ct.jpg": (
        (380, 150, 730, 590), (250, 345), (405, 520), (420, 700)),
    "10075-00.png": ((150, 150, 920, 1024), (410, 550), (700, 880), (350, 730)),
    "10076-00.png": ((180, 100, 870, 1024), (410, 560), (700, 900), (350, 720)),
    "10092-00.png": ((100, 150, 820, 1024), (410, 560), (620, 830), (340, 690)),
}

params = load_default_landmark_params()
pytestmark = [
    pytest.mark.skipif(params is None, reason="shipped landmark_net.npz not present"),
    pytest.mark.skipif(not os.path.isdir(EXAMPLES), reason="reference examples absent"),
]


def _load(name):
    from PIL import Image

    im = Image.open(os.path.join(EXAMPLES, name)).convert("RGB")
    return np.asarray(im, np.float32) / 255.0


def _predict(img01):
    net = LandmarkNet()
    x = jnp.asarray(img01)[None]
    return np.asarray(net.apply({"params": params}, x))[0]  # (68, 2) px


@pytest.mark.parametrize("name", sorted(ANNOTATIONS))
def test_real_photo_geometry(name):
    (bx0, by0, bx1, by1), (ey0, ey1), (my0, my1), (ex0, ex1) = ANNOTATIONS[name]
    img = _load(name)
    lm = _predict(img)
    assert np.isfinite(lm).all()

    eye_l = lm[36:42].mean(axis=0)
    eye_r = lm[42:48].mean(axis=0)
    mouth = lm[48:68].mean(axis=0)
    face_h = by1 - by0

    # eye/mouth vertical bands (annotation bands are already loose)
    for label, pt, (lo, hi) in [
        ("left eye", eye_l, (ey0, ey1)),
        ("right eye", eye_r, (ey0, ey1)),
        ("mouth", mouth, (my0, my1)),
    ]:
        slack = 0.08 * face_h
        assert lo - slack <= pt[1] <= hi + slack, (
            f"{name}: {label} y={pt[1]:.0f} outside [{lo}, {hi}] (+-{slack:.0f})")
    # eye horizontal placement + ordering
    slack_x = 0.10 * (bx1 - bx0)
    assert ex0 - slack_x <= eye_l[0] <= eye_r[0] <= ex1 + slack_x, (
        f"{name}: eyes x ({eye_l[0]:.0f}, {eye_r[0]:.0f}) outside [{ex0}, {ex1}]")
    assert eye_r[0] - eye_l[0] > 0.06 * (bx1 - bx0), f"{name}: eye span collapsed"
    # eyes clearly above mouth
    assert mouth[1] - (eye_l[1] + eye_r[1]) / 2 > 0.08 * face_h, (
        f"{name}: eyes not above mouth")

    # whole landmark cloud inside the inflated face box
    pad_x, pad_y = 0.25 * (bx1 - bx0), 0.25 * face_h
    assert lm[:, 0].min() > bx0 - pad_x and lm[:, 0].max() < bx1 + pad_x, (
        f"{name}: landmark x span [{lm[:,0].min():.0f}, {lm[:,0].max():.0f}] "
        f"escapes face box [{bx0}, {bx1}]")
    assert lm[:, 1].min() > by0 - pad_y and lm[:, 1].max() < by1 + pad_y, (
        f"{name}: landmark y span escapes face box")

    # the FFHQ quad derived from these landmarks contains the annotated
    # eye/mouth points (the quad is what the whole pipeline crops with)
    from vface_tpu.preprocess.align import compute_quad

    quad, qsize = compute_quad(jnp.asarray(lm)[None])
    quad = np.asarray(quad)[0]
    assert np.isfinite(quad).all() and float(qsize[0]) > 0
    qx0, qx1 = quad[:, 0].min(), quad[:, 0].max()
    qy0, qy1 = quad[:, 1].min(), quad[:, 1].max()
    for px, py in [((ex0 + ex1) / 2, (ey0 + ey1) / 2), ((ex0 + ex1) / 2, (my0 + my1) / 2)]:
        assert qx0 < px < qx1 and qy0 < py < qy1, (
            f"{name}: quad [{qx0:.0f},{qx1:.0f}]x[{qy0:.0f},{qy1:.0f}] misses ({px},{py})")


def test_real_photo_shift_equivariance():
    """Translate elon.jpeg by 12 px; predictions must track the shift (< 6 px
    residual on the eye/mouth centroids) — real-photo crop stability."""
    img = _load("elon.jpeg")
    shift = 12
    rolled = np.roll(img, shift, axis=1)
    lm0, lm1 = _predict(img), _predict(rolled)
    c0 = np.stack([lm0[36:48].mean(axis=0), lm0[48:68].mean(axis=0)])
    c1 = np.stack([lm1[36:48].mean(axis=0), lm1[48:68].mean(axis=0)])
    resid = np.abs(c1 - c0 - np.asarray([shift, 0.0])).max()
    assert resid < 6.0, f"shift residual {resid:.1f} px (want < 6)"
