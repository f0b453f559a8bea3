"""End-to-end flagship flow: tiny video swap through the public pipeline API.

Exercises align → parse → conditioning → co-inversion → 3-chunk hooked
sampling (FSAI+FGATS) → decode → background trick → paste-back, plus the
short-window and flow=None edge paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vface_tpu.models import ModelConfig, VFaceModel
from vface_tpu.models.raft import RAFT, RAFTConfig
from vface_tpu.pipelines.video_swap import SwapOptions, VideoSwapPipeline


@pytest.fixture(scope="module")
def pipeline(tiny_bundle):
    model, params = tiny_bundle
    opts = SwapOptions(
        ddim_steps=2, inversion_steps=2, window=3, image_size=32, parser_size=64
    )
    pipe = VideoSwapPipeline(model, opts)
    pipe.raft = RAFT(RAFTConfig(iters=2))
    rng = jax.random.PRNGKey(1)
    aux_params = {
        "bisenet": pipe.bisenet.init(rng, jnp.zeros((1, 64, 64, 3)))["params"],
        "raft": pipe.raft.init(
            rng, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3))
        )["params"],
        "landmark": pipe.landmark_net.init(rng, jnp.zeros((1, 32, 32, 3)))["params"],
    }
    return pipe, params, aux_params


def test_video_swap_end_to_end(pipeline):
    """4 frames, window 3 → one full window + one short window (flow of len 0
    handled), output full frames in [0,1]."""
    pipe, params, aux_params = pipeline
    frames = np.random.default_rng(0).uniform(0, 1, (4, 48, 48, 3)).astype(np.float32)
    source = np.random.default_rng(1).uniform(0, 1, (48, 48, 3)).astype(np.float32)
    out = pipe.swap_video_frames(params, aux_params, frames, source)
    assert out.shape == frames.shape
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_single_frame_video(pipeline):
    """A 1-frame video takes the flow=None path."""
    pipe, params, aux_params = pipeline
    frames = np.random.default_rng(2).uniform(0, 1, (1, 48, 48, 3)).astype(np.float32)
    source = np.random.default_rng(3).uniform(0, 1, (48, 48, 3)).astype(np.float32)
    out = pipe.swap_video_frames(params, aux_params, frames, source)
    assert out.shape == frames.shape
    assert np.isfinite(out).all()


def test_co_inversion_is_dead_compute(pipeline):
    """Inverting target-only vs the reference's 2B co-inversion is
    output-identical (hooks off during inversion; only the target chunk is
    consumed)."""
    import dataclasses

    from vface_tpu.pipelines.video_swap import VideoSwapPipeline

    pipe, params, aux_params = pipeline
    frames = np.random.default_rng(5).uniform(0, 1, (3, 48, 48, 3)).astype(np.float32)
    source = np.random.default_rng(6).uniform(0, 1, (48, 48, 3)).astype(np.float32)
    out_fast = pipe.swap_video_frames(params, aux_params, frames, source)
    pipe_ref = VideoSwapPipeline(
        pipe.model, dataclasses.replace(pipe.opts, co_invert_source=True)
    )
    pipe_ref.raft = pipe.raft
    out_ref = pipe_ref.swap_video_frames(params, aux_params, frames, source)
    np.testing.assert_allclose(out_fast, out_ref, atol=1e-5)


def test_non_square_hd_frames(pipeline):
    """Full frames need not be square or small — e.g. a 16:9 'HD-like' shape;
    crops/paste-back handle arbitrary frame geometry (the 1080p path)."""
    pipe, params, aux_params = pipeline
    frames = np.random.default_rng(9).uniform(0, 1, (2, 72, 128, 3)).astype(np.float32)
    source = np.random.default_rng(10).uniform(0, 1, (48, 48, 3)).astype(np.float32)
    out = pipe.swap_video_frames(params, aux_params, frames, source)
    assert out.shape == frames.shape
    assert np.isfinite(out).all()


def test_degenerate_landmark_fallback(pipeline):
    """Collapsed landmarks (detector failure analogue) fall back to the
    previous frame's quad / a centred crop instead of producing NaNs
    (reference failure handling, VFace_inference_batch.py:297-304)."""
    import jax.numpy as jnp

    pipe, params, aux_params = pipeline
    lm_bad = jnp.ones((2, 68, 2)) * 24.0  # all landmarks at one point
    frames = jnp.asarray(
        np.random.default_rng(11).uniform(0, 1, (2, 48, 48, 3)).astype(np.float32)
    )
    crops, coeffs = pipe.align_crops(aux_params, frames, landmarks=lm_bad)
    assert np.isfinite(np.asarray(crops)).all()
    assert np.isfinite(np.asarray(coeffs)).all()
