"""Runtime subsystems: manifests, params snapshots, detector decode, metrics log."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def test_video_manifest_roundtrip(tmp_path):
    from vface_tpu.runtime.checkpoint import VideoProgressManifest

    p = str(tmp_path / "v.manifest.json")
    m = VideoProgressManifest(p)
    assert not m.is_done(0)
    m.mark_done(0, 6, ["a.png"])
    m.mark_done(6, 3, ["b.png"])
    assert m.completed_frames() == 9
    # reload from disk — resume sees the same state
    m2 = VideoProgressManifest(p)
    assert m2.is_done(0) and m2.is_done(6) and not m2.is_done(12)


def test_params_npz_roundtrip(tmp_path):
    from vface_tpu.runtime.checkpoint import load_params_npz, save_params_npz

    params = {"a": {"kernel": jnp.arange(6.0).reshape(2, 3)}, "b": jnp.ones(4)}
    p = str(tmp_path / "p.npz")
    save_params_npz(p, params)
    out = load_params_npz(p, params)
    np.testing.assert_allclose(np.asarray(out["a"]["kernel"]), np.arange(6.0).reshape(2, 3))
    np.testing.assert_allclose(np.asarray(out["b"]), np.ones(4))


def test_detector_decode_synthetic_peak():
    """A planted heatmap peak decodes to the right box center and size."""
    from vface_tpu.preprocess.detector import decode_detections

    h = w = 8
    heat = jnp.zeros((1, h, w, 1)).at[0, 3, 5, 0].set(0.9)
    size = jnp.zeros((1, h, w, 2)).at[0, 3, 5].set(jnp.asarray([2.0, 3.0]))
    offset = jnp.zeros((1, h, w, 2)).at[0, 3, 5].set(jnp.asarray([0.25, 0.5]))
    boxes, scores = decode_detections(heat, size, offset, top_k=1, stride=8)
    np.testing.assert_allclose(float(scores[0, 0]), 0.9, rtol=1e-6)
    cx, cy, bw, bh = np.asarray(boxes)[0, 0]
    np.testing.assert_allclose(cx, (5 + 0.25) * 8, rtol=1e-5)
    np.testing.assert_allclose(cy, (3 + 0.5) * 8, rtol=1e-5)
    assert bw > 0 and bh > 0


def test_metrics_logger(tmp_path):
    from vface_tpu.utils.logging import MetricsLogger

    lg = MetricsLogger(str(tmp_path), echo=False)
    lg.log(1, {"loss": 0.5}, prefix="train")
    lg.log(2, {"loss": jnp.asarray(0.25)}, prefix="train")
    lg.close()
    lines = [json.loads(l) for l in open(lg.path)]
    assert lines[0]["train/loss"] == 0.5 and lines[1]["step"] == 2


def test_lambda_linear_schedule_values():
    from vface_tpu.utils.lr_schedules import lambda_linear_schedule

    s = lambda_linear_schedule(warm_up_steps=100)
    assert abs(float(s(0)) - 1e-6) < 1e-7
    assert abs(float(s(100)) - 1.0) < 1e-5
    assert abs(float(s(10_000)) - 1.0) < 1e-5
