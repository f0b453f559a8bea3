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


def test_split_train_step_matches_fused(tiny_bundle):
    """make_split_train_step (three programs, shared rng draws — the 512²
    recon2+ID compiler-crash workaround) produces the SAME updated params
    and loss as the fused step."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vface_tpu.pipelines.train import (
        TrainConfig,
        make_optimizer,
        make_split_train_step,
        make_train_step,
    )

    model, params = tiny_bundle
    tcfg = TrainConfig(
        reconstruct=True, reconstruct_steps=2, id_loss_weight=0.3,
        lpips_loss_weight=0.0, warmup_steps=10,
    )
    opt = make_optimizer(tcfg, params)
    s = model.cfg.image_size
    clip_sz = model.cfg.cond.clip.image_size
    k = jax.random.split(jax.random.PRNGKey(1), 6)
    batch = {
        "gt_image": jax.random.uniform(k[0], (2, s, s, 3)) * 2 - 1,
        "inpaint": jax.random.uniform(k[1], (2, s, s, 3)) * 2 - 1,
        "mask": (jax.random.uniform(k[2], (2, s, s, 1)) > 0.3).astype(jnp.float32),
        "ref_clip": jax.random.normal(k[3], (2, clip_sz, clip_sz, 3)) * 0.3,
        "ref_face01": jax.random.uniform(k[4], (2, 112, 112, 3)),
        "landmarks": jax.random.uniform(k[5], (2, 136)),
    }
    rng = jax.random.PRNGKey(7)

    fused = jax.jit(make_train_step(model, opt, tcfg))
    p1, _, logs1 = fused(params, opt.init(params), batch, rng)
    split = make_split_train_step(model, opt, tcfg)
    p2, _, logs2 = split(params, opt.init(params), batch, rng)

    np.testing.assert_allclose(
        float(logs1["loss"]), float(logs2["loss"]), rtol=1e-5
    )
    flat1 = jax.tree_util.tree_leaves(p1)
    flat2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
