"""Shipped FaceDetector weights: multi-face recall + localization.

Gates `vface_tpu/weights/detector.npz` (distilled on multi-face synthetic
scenes, `scripts/distill_detector.py`) — the trained backing for
`swap_video_frames_multiface` (pipelines/video_swap.py), which the reference
cannot do at all (dlib HOG detects a single face, alignmengt.py:39-81).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vface_tpu.preprocess.detector import (
    FaceDetector,
    decode_detections,
    load_default_detector_params,
)
from vface_tpu.preprocess.synthetic_faces import render_scene

params = load_default_detector_params()
needs_weights = pytest.mark.skipif(
    params is None, reason="shipped detector.npz not present"
)


@needs_weights
def test_multiface_recall_on_held_out_scenes():
    net = FaceDetector()
    rng = np.random.default_rng(4242)
    imgs, gts, valids = [], [], []
    for _ in range(24):
        img, boxes, valid = render_scene(rng, 256)
        imgs.append(img)
        gts.append(boxes)
        valids.append(valid)
    heat, size, off = jax.jit(lambda p, x: net.apply({"params": p}, x))(
        params, jnp.asarray(np.stack(imgs))
    )
    dets, scores = decode_detections(heat, size, off, top_k=4, image_hw=(256, 256))
    dets, scores = np.asarray(dets), np.asarray(scores)
    hit = tot = 0
    cerr = []
    for i in range(len(imgs)):
        for j in range(4):
            if not valids[i][j]:
                continue
            tot += 1
            gt = gts[i][j]
            d = np.linalg.norm(dets[i, :, :2] - gt[:2], axis=-1)
            best = int(np.argmin(np.where(scores[i] > 0.3, d, np.inf)))
            if np.isfinite(d[best]) and d[best] < 0.5 * max(gt[2], gt[3]):
                hit += 1
                cerr.append(d[best])
    recall = hit / max(tot, 1)
    assert recall >= 0.8, f"held-out recall {recall:.2f} ({hit}/{tot}), want >= 0.8"
    assert np.mean(cerr) < 10.0, f"center error {np.mean(cerr):.1f} px @256"


@needs_weights
def test_detection_stability_under_shift():
    """Same scene shifted 8 px: matched detections move by ~the shift."""
    net = FaceDetector()
    img, boxes, valid = render_scene(np.random.default_rng(7), 256)
    shift = 8
    rolled = np.roll(img, shift, axis=1)
    fn = jax.jit(lambda p, x: net.apply({"params": p}, x))
    d0, s0 = decode_detections(*fn(params, jnp.asarray(img)[None]), top_k=4,
                               image_hw=(256, 256))
    d1, s1 = decode_detections(*fn(params, jnp.asarray(rolled)[None]), top_k=4,
                               image_hw=(256, 256))
    d0, d1 = np.asarray(d0)[0], np.asarray(d1)[0]
    s0, s1 = np.asarray(s0)[0], np.asarray(s1)[0]
    # hysteresis: match CONFIDENT source detections (>0.35) against a LOWER
    # candidate threshold (0.25) — a borderline ghost sitting exactly at one
    # threshold flickers in/out between the two passes and falsely matches a
    # distant detection (observed with the round-4 weights: all detections
    # shift-equivariant to the pixel, but a 0.300-score ghost crossed 0.3)
    k0 = d0[s0 > 0.35]
    k1 = d1[s1 > 0.25]
    assert len(k0) >= 1 and len(k1) >= 1
    for det in k0:
        moved = det[:2] + (shift, 0)
        if moved[0] > 250:  # rolled off the edge
            continue
        dd = np.linalg.norm(k1[:, :2] - moved, axis=-1).min()
        assert dd < 6.0, f"detection drifted {dd:.1f} px under an 8 px shift"
