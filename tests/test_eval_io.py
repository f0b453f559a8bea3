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


def test_id_retrieval_mask_crop_reference_semantics():
    """mask_crop == the reference MaskedImagePathDataset (ID_retrieval.py:
    172-229): resize 112², binarise by preserve list, bilinear mask resize,
    multiply in [-1,1] space (masked-out = mid-gray 0.5 in [0,1] terms)."""
    from vface_tpu.eval.id_retrieval import RETRIEVAL_PRESERVE, mask_crop

    rng = np.random.default_rng(4)
    img = rng.uniform(0, 1, (2, 224, 224, 3)).astype(np.float32)
    labels = np.zeros((2, 224, 224), np.uint8)
    labels[:, :112] = 1  # skin (preserved in every dataset list)
    labels[:, 112:] = 18  # not preserved for celeba

    out = mask_crop(img, labels, "celeba")
    assert out.shape == (2, 112, 112, 3)
    # preserved half keeps image content, masked half is exactly mid-gray
    np.testing.assert_allclose(out[:, 80:], 0.5, atol=1e-5)
    assert np.abs(out[:, :40] - 0.5).max() > 0.1
    # 'none' preserves everything → pure resize, nothing grayed
    out_none = mask_crop(img, labels, "none")
    assert np.abs(out_none - 0.5).max() > 0.1
    assert not np.allclose(out_none[:, 80:], 0.5, atol=1e-3)
    # preserve lists pinned to the reference's per-dataset constants
    assert RETRIEVAL_PRESERVE["ffhq"] == (1, 2, 3, 5, 6, 7, 9)
    assert RETRIEVAL_PRESERVE["ff++"] == (1, 2, 4, 5, 8, 9)


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


def test_avi_audio_passthrough(tmp_path):
    """AVI with an interleaved PCM stream: the structure parses as a valid
    2-stream RIFF (vids + auds), all written sample bytes are recoverable from
    the '01wb' chunks, and every chunk is idx1-indexed — the reference's
    audio-mux capability (VFace_inference_batch.py:646-666) with no ffmpeg."""
    import struct
    import wave

    from vface_tpu.io.video import native_available, read_wav, write_avi

    if not native_available():
        import pytest

        pytest.skip("native vface_io not built")

    fps, sr = 10, 8000
    n_frames = 5
    t = np.arange(int(sr * n_frames / fps))
    audio = (np.sin(2 * np.pi * 440 * t / sr) * 20000).astype(np.int16)
    # stdlib round-trip for the side-file loader too
    wav_p = str(tmp_path / "a.wav")
    with wave.open(wav_p, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(audio.tobytes())
    loaded, sr_back = read_wav(wav_p)
    assert sr_back == sr and loaded.shape == (len(audio), 1)
    np.testing.assert_array_equal(loaded[:, 0], audio)

    frames = np.random.default_rng(0).integers(0, 256, (n_frames, 16, 16, 3), np.uint8)
    avi = str(tmp_path / "av.avi")
    write_avi(avi, frames, fps=fps, audio=loaded, sample_rate=sr)

    data = open(avi, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    # walk the movi list chunks
    movi = data.index(b"movi")
    idx1 = data.index(b"idx1")
    pos = movi + 4
    vid_chunks, aud_bytes = 0, b""
    while pos < idx1 - 8:
        tag, size = data[pos : pos + 4], struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        if tag == b"00db":
            vid_chunks += 1
        elif tag == b"01wb":
            aud_bytes += data[pos + 8 : pos + 8 + size]
        else:
            break
        pos += 8 + size + (size & 1)
    assert vid_chunks == n_frames
    np.testing.assert_array_equal(np.frombuffer(aud_bytes, np.int16), audio)
    # idx1 indexes every chunk
    n_idx = struct.unpack("<I", data[idx1 + 4 : idx1 + 8])[0] // 16
    assert n_idx == vid_chunks + audio_chunk_count(data, movi, idx1)
    # header declares 2 streams and an auds strh exists
    assert b"auds" in data[:movi]
    assert struct.unpack("<I", data[data.index(b"avih") + 8 + 24 :][:4])[0] == 2


def audio_chunk_count(data, movi, idx1):
    import struct

    pos, n = movi + 4, 0
    while pos < idx1 - 8:
        tag, size = data[pos : pos + 4], struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        if tag == b"01wb":
            n += 1
        pos += 8 + size + (size & 1)
    return n
