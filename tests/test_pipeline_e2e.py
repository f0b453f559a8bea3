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


def test_compute_flow_is_backward(pipeline):
    """FGATS flow direction pin: the reference computes backward flow,
    RAFT(frame_{i+1}, frame_i) (temporal_flow.py:183 `compute_flow(frame2,
    frame1)`), so flow[i] lives on frame i+1's grid and maps back to frame i.
    compute_flow must therefore pass the LATER frames as RAFT's first arg."""
    pipe, params, aux_params = pipeline

    calls = {}

    class _Recorder:
        def apply(self, variables, a, b):
            calls["args"] = (a, b)
            return jnp.zeros((a.shape[0],) + a.shape[1:3] + (2,))

    crops01 = jnp.asarray(
        np.random.default_rng(7).uniform(0, 1, (3, 32, 32, 3)).astype(np.float32)
    )
    real_raft = pipe.raft
    try:
        pipe.raft = _Recorder()
        # the public compute_flow is jitted (cached trace would bypass the
        # recorder); pin the direction on the eager impl the jit traces
        flow = pipe._compute_flow_impl(aux_params, crops01)
    finally:
        pipe.raft = real_raft
    assert flow.shape == (2, 32, 32, 2)
    a, b = calls["args"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(crops01[1:] * 2 - 1))
    np.testing.assert_allclose(np.asarray(b), np.asarray(crops01[:-1] * 2 - 1))
    # and the public jitted wrapper must route through the same impl with the
    # same argument wiring — compare numerically with the real (tiny) RAFT
    got = np.asarray(pipe.compute_flow(aux_params, crops01))
    want = np.asarray(pipe._compute_flow_impl(aux_params, crops01))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sharded_windows_match_sequential(pipeline):
    """swap_video_frames_sharded (windows data-sharded over a CPU mesh, padded
    group + trailing short window) equals the sequential loop — windows carry
    no cross-window state, so multi-chip inference is pure DP over windows."""
    from vface_tpu.parallel.mesh import make_mesh

    pipe, params, aux_params = pipeline
    frames = np.random.default_rng(20).uniform(0, 1, (7, 48, 48, 3)).astype(np.float32)
    source = np.random.default_rng(21).uniform(0, 1, (48, 48, 3)).astype(np.float32)
    seq = pipe.swap_video_frames(params, aux_params, frames, source)
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    shd = pipe.swap_video_frames_sharded(params, aux_params, frames, source, mesh)
    np.testing.assert_allclose(shd, seq, atol=1e-5)


def test_streaming_superpack_bit_exact(pipeline):
    """The double-buffered streaming super-pack loop (host-resident frames)
    equals the non-streaming one (device-array input forces the old path),
    including the odd-pack/short-window remainder and the cross-group
    alignment fallback chain."""
    import dataclasses as dc

    from vface_tpu.pipelines.video_swap import VideoSwapPipeline

    pipe, params, aux_params = pipeline
    hl = pipe.model.cfg.latent_size
    opts = dc.replace(
        pipe.opts, window=2, batch_windows=2, invert_packs=2,
        flow_tokens=hl * hl,
    )
    # 11 frames = 2 groups of 8? no: group = 2*w_pack = 8 → 1 group + pack(4) + short(... )
    frames = np.random.default_rng(60).uniform(0, 1, (11, 48, 48, 3)).astype(np.float32)
    source = np.random.default_rng(61).uniform(0, 1, (48, 48, 3)).astype(np.float32)
    pipe1 = VideoSwapPipeline(pipe.model, opts)
    pipe1.raft = pipe.raft
    streamed = pipe1.swap_video_frames(params, aux_params, frames, source)
    pipe2 = VideoSwapPipeline(pipe.model, opts)
    pipe2.raft = pipe.raft
    plain = pipe2.swap_video_frames(
        params, aux_params, jnp.asarray(frames), source
    )
    np.testing.assert_array_equal(np.asarray(streamed), np.asarray(plain))


def test_frame_sharded_video_matches_sequential(pipeline):
    """swap_video_frames_frame_sharded (the --mesh_frames LATENCY path: one
    window at a time, frames sharded over the mesh, FGATS flow crossing shard
    boundaries via the ppermute halo) equals the sequential loop, including
    the trailing short window's sequential fallback; ineligible operating
    points are rejected loudly."""
    import dataclasses as dc

    from vface_tpu.parallel.mesh import make_mesh
    from vface_tpu.pipelines.video_swap import VideoSwapPipeline

    pipe, params, aux_params = pipeline
    # 7 frames: one full 4-frame window (sharded 2-way) + 3-frame remainder
    opts = dc.replace(pipe.opts, window=4,
                      flow_tokens=pipe.model.cfg.latent_size ** 2)
    pipe1 = VideoSwapPipeline(pipe.model, opts)
    pipe1.raft = pipe.raft
    frames = np.random.default_rng(50).uniform(0, 1, (7, 48, 48, 3)).astype(np.float32)
    source = np.random.default_rng(51).uniform(0, 1, (48, 48, 3)).astype(np.float32)
    seq = pipe1.swap_video_frames(params, aux_params, frames, source)
    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    shd = pipe1.swap_video_frames_frame_sharded(
        params, aux_params, frames, source, mesh
    )
    np.testing.assert_allclose(shd, seq, atol=2e-5)

    # eligibility gates (documented in the method docstring)
    for bad in (
        dc.replace(opts, keep_recon_chunk=True),
        dc.replace(opts, cross_window_carry=True),
        dc.replace(opts, batch_windows=2),
        dc.replace(opts, encoder_interval=2),
        dc.replace(opts, window=3),  # not divisible by mesh size 2
    ):
        pipe_bad = VideoSwapPipeline(pipe.model, bad)
        pipe_bad.raft = pipe.raft
        with pytest.raises(ValueError):
            pipe_bad.swap_video_frames_frame_sharded(
                params, aux_params, frames, source, mesh
            )


def test_cross_window_fgats_carry(tiny_bundle):
    """Cross-window FGATS carry (beyond the reference): with the carry on,
    window 0's frames are unchanged (no predecessor), window 1's change (its
    frame 0 now blends with the warped previous-window state); temporal
    smoothness at the boundary does not regress."""
    import dataclasses as dc

    from vface_tpu.eval.temporal import warp_error
    from vface_tpu.models.raft import RAFT, RAFTConfig
    from vface_tpu.pipelines.video_swap import SwapOptions, VideoSwapPipeline

    model, params = tiny_bundle
    hl = model.cfg.latent_size
    opts = SwapOptions(
        ddim_steps=2, inversion_steps=2, window=3, image_size=32, parser_size=64,
        flow_tokens=hl * hl,  # FGATS active at the tiny ds1 grid
    )
    pipe_off = VideoSwapPipeline(model, opts)
    pipe_off.raft = RAFT(RAFTConfig(iters=2))
    pipe_on = VideoSwapPipeline(model, dc.replace(opts, cross_window_carry=True))
    pipe_on.raft = pipe_off.raft
    rng = jax.random.PRNGKey(1)
    aux_params = {
        "bisenet": pipe_off.bisenet.init(rng, jnp.zeros((1, 64, 64, 3)))["params"],
        "raft": pipe_off.raft.init(
            rng, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3))
        )["params"],
        "landmark": pipe_off.landmark_net.init(rng, jnp.zeros((1, 32, 32, 3)))["params"],
    }
    frames = np.random.default_rng(30).uniform(0, 1, (6, 48, 48, 3)).astype(np.float32)
    source = np.random.default_rng(31).uniform(0, 1, (48, 48, 3)).astype(np.float32)

    out_off = pipe_off.swap_video_frames(params, aux_params, frames, source)
    out_on = pipe_on.swap_video_frames(params, aux_params, frames, source)

    # window 0 (frames 0-2): no predecessor → identical with carry on/off
    np.testing.assert_allclose(out_on[:3], out_off[:3], atol=1e-5)
    # window 1: the carry changes the result
    assert np.abs(out_on[3:] - out_off[3:]).max() > 1e-6
    assert np.isfinite(out_on).all()

    # temporal smoothness across the boundary (frames 2→3): the carry must
    # not regress the warp error (identity flow on these synthetic frames)
    zero_flow = jnp.zeros((1, 48, 48, 2))
    we_off = float(warp_error(jnp.asarray(out_off[2:4]), zero_flow))
    we_on = float(warp_error(jnp.asarray(out_on[2:4]), zero_flow))
    assert np.isfinite(we_on) and we_on <= we_off * 1.25


@pytest.fixture(scope="module")
def fgats_clip_baseline(pipeline):
    """Shared sequential-loop golden output for the pack-restructuring
    exactness tests (pipeline_packs / invert_packs): ONE 10-frame clip at
    window 3 with FGATS active at the tiny token count, run once through
    the plain sequential loop. 10 frames = 3 full packs + a remainder, so
    every variant exercises its special path AND the shared edges."""
    import dataclasses as dc

    from vface_tpu.pipelines.video_swap import VideoSwapPipeline

    pipe, params, aux_params = pipeline
    hl = pipe.model.cfg.latent_size
    opts = dc.replace(pipe.opts, flow_tokens=hl * hl)
    frames = np.random.default_rng(50).uniform(0, 1, (10, 48, 48, 3)).astype(np.float32)
    source = np.random.default_rng(51).uniform(0, 1, (48, 48, 3)).astype(np.float32)
    pipe_seq = VideoSwapPipeline(pipe.model, opts)
    pipe_seq.raft = pipe.raft
    seq = pipe_seq.swap_video_frames(params, aux_params, frames, source)
    return opts, frames, source, seq


def test_pipelined_packs_match_sequential(pipeline, fgats_clip_baseline):
    """pipeline_packs (pack i+1's inversion riding pack i's sampling evals as
    fusion-neutral bystander rows) is output-exact vs the sequential loop —
    with FGATS ACTIVE at the tiny token count, so the bystander exclusion is
    what keeps the inversion rows hook-free. Covers prologue, steady-state,
    epilogue, and the trailing short window."""
    import dataclasses as dc

    from vface_tpu.pipelines.video_swap import VideoSwapPipeline

    pipe, params, aux_params = pipeline
    opts, frames, source, seq = fgats_clip_baseline
    pipe_pl = VideoSwapPipeline(pipe.model, dc.replace(opts, pipeline_packs=True))
    pipe_pl.raft = pipe.raft
    pl = pipe_pl.swap_video_frames(params, aux_params, frames, source)
    np.testing.assert_allclose(pl, seq, atol=2e-5)


def test_superpacks_match_sequential(pipeline, fgats_clip_baseline):
    """invert_packs=2 (two packs' inversions in one wider scan, sampling and
    VAE stages re-batched) is output-exact vs the sequential loop — FGATS
    active at the tiny token count, so the per-pack flow slicing is what
    keeps the packs independent. 10 frames @ window 3 covers the super-pack,
    the odd trailing pack, and the short remainder."""
    import dataclasses as dc

    from vface_tpu.pipelines.video_swap import VideoSwapPipeline

    pipe, params, aux_params = pipeline
    opts, frames, source, seq = fgats_clip_baseline
    pipe_sp = VideoSwapPipeline(pipe.model, dc.replace(opts, invert_packs=2))
    pipe_sp.raft = pipe.raft
    sp = pipe_sp.swap_video_frames(params, aux_params, frames, source)
    np.testing.assert_allclose(sp, seq, atol=2e-5)


def test_superpack_merged_sampling_matches_sequential(pipeline, fgats_clip_baseline):
    """merge_sampling=True (both packs' 2-chunk sampling scans fused into one
    b=4F eval, FGATS pair-masked at the pack boundary) is output-exact vs the
    sequential loop."""
    import dataclasses as dc

    from vface_tpu.pipelines.video_swap import VideoSwapPipeline

    pipe, params, aux_params = pipeline
    opts, frames, source, seq = fgats_clip_baseline
    pipe_m = VideoSwapPipeline(
        pipe.model, dc.replace(opts, invert_packs=2, merge_sampling=True)
    )
    pipe_m.raft = pipe.raft
    merged = pipe_m.swap_video_frames(params, aux_params, frames, source)
    np.testing.assert_allclose(merged, seq, atol=2e-5)


def test_batched_windows_match_separate(pipeline):
    """batch_windows=2 (two windows packed into one program with the FGATS
    blend masked at the boundary) equals the window-by-window loop — with
    FGATS ACTIVE at the tiny token count, so the boundary mask is what keeps
    the windows independent."""
    import dataclasses as dc

    from vface_tpu.pipelines.video_swap import VideoSwapPipeline

    pipe, params, aux_params = pipeline
    hl = pipe.model.cfg.latent_size
    opts = dc.replace(pipe.opts, flow_tokens=hl * hl)
    frames = np.random.default_rng(40).uniform(0, 1, (6, 48, 48, 3)).astype(np.float32)
    source = np.random.default_rng(41).uniform(0, 1, (48, 48, 3)).astype(np.float32)
    pipe1 = VideoSwapPipeline(pipe.model, opts)
    pipe1.raft = pipe.raft
    seq = pipe1.swap_video_frames(params, aux_params, frames, source)
    pipe2 = VideoSwapPipeline(pipe.model, dc.replace(opts, batch_windows=2))
    pipe2.raft = pipe.raft
    packed = pipe2.swap_video_frames(params, aux_params, frames, source)
    np.testing.assert_allclose(packed, seq, atol=2e-5)
    # sanity: without the boundary mask the packed result differs (the blend
    # would leak across the boundary), proving the mask is load-bearing
    pipe3 = VideoSwapPipeline(
        pipe.model, dc.replace(opts, batch_windows=2, cross_window_carry=True)
    )
    pipe3.raft = pipe.raft
    leaky = pipe3.swap_video_frames(params, aux_params, frames, source)
    assert np.abs(np.asarray(leaky) - seq).max() > 1e-6


def test_precomputed_keep_masks_override_parser(pipeline):
    """frame_keep/source_keep (the reference's precomputed-mask mode,
    video_swap_dataset.py:86-409) must (a) bypass BiSeNet entirely — no
    "bisenet" aux needed — and (b) reproduce the parser path bit-exactly
    when fed the masks the parser would produce."""
    from vface_tpu.preprocess.masks import TRAIN_REMOVE, inpaint_inputs

    pipe, params, aux_params = pipeline
    frames = np.random.default_rng(0).uniform(size=(3, 32, 32, 3)).astype(np.float32)
    source = np.random.default_rng(1).uniform(size=(32, 32, 3)).astype(np.float32)

    # the masks the parser path would compute, reproduced outside
    crops01, _ = pipe.align_crops(aux_params, jnp.asarray(frames))
    seg = pipe.parse_masks(aux_params, crops01)
    _, keep = inpaint_inputs(crops01 * 2 - 1, seg, TRAIN_REMOVE)
    src_crop01, _ = pipe.align_crops(aux_params, jnp.asarray(source)[None])
    src_seg = pipe.parse_masks(aux_params, src_crop01)
    _, src_keep = inpaint_inputs(src_crop01 * 2 - 1, src_seg, TRAIN_REMOVE)

    ref = pipe.swap_video_frames(params, aux_params, frames, source)
    aux_no_parser = {k: v for k, v in aux_params.items() if k != "bisenet"}
    got = pipe.swap_video_frames(
        params, aux_no_parser, frames, source,
        frame_keep=np.asarray(keep), source_keep=np.asarray(src_keep)[0],
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)

    # the multi-chip path honours the same contract (ADVICE r4: masks were
    # silently dropped on --mesh runs)
    from vface_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=2, devices=jax.devices()[:2])
    got_mesh = pipe.swap_video_frames_sharded(
        params, aux_no_parser, frames, source, mesh,
        frame_keep=np.asarray(keep), source_keep=np.asarray(src_keep)[0],
    )
    np.testing.assert_allclose(np.asarray(got_mesh), np.asarray(ref), atol=1e-5)
