"""Eval-metric math + native IO tests."""

import numpy as np
import pytest

from vface_tpu.eval import frechet_distance, id_retrieval, pose_l2, expression_l2
from vface_tpu.eval.pose import logits_to_degrees


def test_frechet_identical_is_zero():
    rng = np.random.default_rng(0)
    mu = rng.normal(size=8)
    a = rng.normal(size=(100, 8))
    sigma = np.cov(a, rowvar=False)
    d = frechet_distance(mu, sigma, mu, sigma)
    assert abs(d) < 1e-6


def test_frechet_mean_shift():
    mu1 = np.zeros(4)
    mu2 = np.ones(4) * 2.0
    sigma = np.eye(4)
    d = frechet_distance(mu1, sigma, mu2, sigma)
    np.testing.assert_allclose(d, 16.0, rtol=1e-6)  # |mu1-mu2|^2


def test_id_retrieval_perfect():
    rng = np.random.default_rng(1)
    gallery = rng.normal(size=(10, 512))
    gallery /= np.linalg.norm(gallery, axis=1, keepdims=True)
    ids = np.arange(10)
    res = id_retrieval(gallery, gallery, ids)
    assert res["top1"] == 1.0 and res["top5"] == 1.0
    np.testing.assert_allclose(res["mean_cosine"], 1.0, rtol=1e-6)


def test_pose_degrees_mapping():
    import jax.numpy as jnp

    # all mass on bin 33 → 33*3-99 = 0 degrees
    logits = jnp.full((1, 66), -1e9).at[0, 33].set(0.0)
    deg = np.asarray(logits_to_degrees(logits))
    np.testing.assert_allclose(deg, [0.0], atol=1e-4)


def test_metric_reducers():
    a = np.zeros((3, 3))
    b = np.ones((3, 3))
    np.testing.assert_allclose(pose_l2(a, b), np.sqrt(3.0), rtol=1e-6)
    ca = np.zeros((2, 257))
    cb = np.zeros((2, 257))
    cb[:, 80:144] = 1.0
    np.testing.assert_allclose(expression_l2(ca, cb), 8.0, rtol=1e-6)  # sqrt(64)


def test_native_io_roundtrip(tmp_path):
    from vface_tpu.io.video import native_available, read_y4m, write_avi, write_y4m

    # smooth gradient survives 4:2:0 chroma subsampling nearly losslessly
    h, w = 32, 48
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.stack([xx * 255 // w, yy * 255 // h, (xx + yy) * 255 // (h + w)], -1).astype(
        np.uint8
    )
    frames = np.stack([img] * 3)
    p = str(tmp_path / "t.y4m")
    write_y4m(p, frames, fps=10)
    back, fps = read_y4m(p)
    assert back.shape == frames.shape and fps == 10
    assert np.abs(back.astype(int) - frames.astype(int)).max() <= 6

    if native_available():
        avi = str(tmp_path / "t.avi")
        write_avi(avi, frames, fps=10)
        with open(avi, "rb") as f:
            head = f.read(12)
        assert head[:4] == b"RIFF" and head[8:12] == b"AVI "


def test_prefetch_matches_read(tmp_path):
    from vface_tpu.io.video import iter_y4m_prefetched, read_y4m, write_y4m

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (5, 16, 16, 3), dtype=np.uint8)
    p = str(tmp_path / "p.y4m")
    write_y4m(p, frames, fps=10)
    back, _ = read_y4m(p)
    got = np.stack(list(iter_y4m_prefetched(p, depth=2)))
    assert got.shape == (5, 16, 16, 3)
    np.testing.assert_allclose(got, back.astype(np.float32) / 255.0, atol=1e-6)


def test_prefetch_early_close(tmp_path):
    """Closing the prefetch iterator mid-stream shuts the producer down clean."""
    from vface_tpu.io.video import iter_y4m_prefetched, write_y4m

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (20, 32, 32, 3), dtype=np.uint8)
    p = str(tmp_path / "pf.y4m")
    write_y4m(p, frames, fps=10)
    it = iter_y4m_prefetched(p, depth=3)
    got = [next(it) for _ in range(2)]
    it.close()
    assert len(got) == 2 and got[0].shape == (32, 32, 3)
