"""Shipped LandmarkNet weights: accuracy + crop stability.

The reference's geometric chain (dlib landmarks → FFHQ quad → crop,
`/root/reference/REFace/src/utils/alignmengt.py:39-178`) only works with a
TRAINED landmarker; random weights produce meaningless geometry. These tests
gate the shipped distilled checkpoint (`vface_tpu/weights/landmark_net.npz`,
produced by `scripts/distill_landmarks.py --synthetic-faces`):

* held-out landmark error on fresh synthetic faces is small;
* on a synthetic pan (same face translated by a fixed step), the alignment
  quad tracks the pan with < 2 px jitter between adjacent frames — the
  VFace crop-stability requirement (unstable quads destroy FGATS).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vface_tpu.preprocess.landmarks import LandmarkNet, load_default_landmark_params
from vface_tpu.preprocess.synthetic_faces import render_batch, render_pan_sequence

params = load_default_landmark_params()
needs_weights = pytest.mark.skipif(
    params is None, reason="shipped landmark_net.npz not present"
)


@needs_weights
def test_landmark_accuracy_on_held_out_faces():
    net = LandmarkNet()
    imgs, lms = render_batch(np.random.default_rng(123), 16, 128)
    pred = np.asarray(net.apply({"params": params}, jnp.asarray(imgs)))
    err = np.linalg.norm(pred - lms, axis=-1).mean()
    assert err < 5.0, f"mean landmark error {err:.2f} px @128 (want < 5)"


@needs_weights
def test_crop_stability_on_synthetic_pan():
    from vface_tpu.preprocess.align import compute_quad

    net = LandmarkNet()
    step = 2.0
    frames, _ = render_pan_sequence(np.random.default_rng(7), 6, 128, step_px=step)
    pred = net.apply({"params": params}, jnp.asarray(frames))
    quad, qsize = compute_quad(pred)
    quad = np.asarray(quad)  # (F, 4, 2)
    assert np.isfinite(quad).all()
    # adjacent-frame quad deltas must track the pan: |Δ − (step, 0)| < 2 px
    deltas = quad[1:] - quad[:-1]  # (F-1, 4, 2)
    jitter = np.abs(deltas - np.asarray([step, 0.0])).max()
    assert jitter < 2.0, f"quad jitter {jitter:.2f} px (want < 2)"
    # quad size stays stable across the pan
    qs = np.asarray(qsize)
    assert np.abs(qs[1:] - qs[:-1]).max() < 2.0
