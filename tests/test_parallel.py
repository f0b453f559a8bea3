"""Mesh / sharding / halo-exchange tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vface_tpu.parallel.mesh import frame_halo_exchange, make_mesh, pmean, shard_batch


def test_mesh_shape():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1


def test_shard_batch_places_leading_axis():
    mesh = make_mesh()
    x = jnp.arange(16.0).reshape(16, 1)
    xs = shard_batch(mesh, x)
    assert xs.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(xs), np.asarray(x))


def test_frame_halo_exchange():
    """Each shard receives its left neighbour's last frame; shard 0 gets its own first."""
    mesh = make_mesh()
    n = 8
    f_local = 2
    # global frames 0..15, 2 per device
    x = jnp.arange(n * f_local, dtype=jnp.float32).reshape(n * f_local, 1)

    from jax.experimental.shard_map import shard_map

    halo = shard_map(
        lambda xs: frame_halo_exchange(xs, "data")[None],
        mesh=mesh,
        in_specs=P("data"),
        out_specs=P("data"),
    )(x)
    got = np.asarray(halo).reshape(n)
    # device d holds frames [2d, 2d+1]; halo should be frame 2d-1 (device d-1's last),
    # except device 0 which falls back to its own first frame (0)
    expect = np.array([0] + [2 * d - 1 for d in range(1, n)], np.float32)
    np.testing.assert_allclose(got, expect)


def test_pmean_gradients_reduce():
    mesh = make_mesh()
    from jax.experimental.shard_map import shard_map

    x = jnp.arange(8.0)
    out = shard_map(
        lambda xs: pmean(jnp.sum(xs))[None],
        mesh=mesh,
        in_specs=P("data"),
        out_specs=P("data"),
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.full(8, np.mean(np.arange(8.0))))


def test_halo_sharded_fgats_matches_unsharded():
    """align_by_flow_sharded == align_by_flow across shard boundaries."""
    from jax.experimental.shard_map import shard_map as smap

    from vface_tpu.ops.warp import align_by_flow
    from vface_tpu.parallel.mesh import align_by_flow_sharded

    mesh = make_mesh()
    F, H, W, C = 16, 8, 8, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (F, H, W, C))
    flow = jax.random.normal(jax.random.PRNGKey(1), (F - 1, H, W, 2)) * 1.5
    ref = align_by_flow(x, flow, alpha=0.8)
    flow_padded = jnp.concatenate([jnp.zeros((1, H, W, 2)), flow], axis=0)
    out = smap(
        lambda xs, fs: align_by_flow_sharded(xs, fs, alpha=0.8),
        mesh=mesh,
        in_specs=(P("data"), P("data")),
        out_specs=P("data"),
    )(x, flow_padded)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_frame_sharded_sampling_matches_unsharded(tiny_bundle):
    """Flow-ON frame-sharded sampling (shard_map + 1-frame FGATS halo via
    FusionConfig.flow_axis) == the unsharded sampler — the consumer of
    align_by_flow_halo demanded by round-3 VERDICT item 4."""
    from vface_tpu.models import InjectionSpec
    from vface_tpu.ops.attention import FusionConfig
    from vface_tpu.parallel.frame_sharded import vface_sample_frame_sharded
    from vface_tpu.samplers import vface_sample

    model, params = tiny_bundle
    mesh = make_mesh()
    n = mesh.shape["data"]
    f = n  # one frame per device
    hl = model.cfg.latent_size
    d = model.cfg.unet.context_dim
    tok = hl * hl  # ds1 token count of the tiny model
    spec = InjectionSpec(
        input_blocks=FusionConfig("flow_fix", flow_tokens=tok), chunks=3
    )
    r = jax.random.PRNGKey(3)
    ks = jax.random.split(r, 8)
    x_T = jax.random.normal(ks[0], (f, hl, hl, 4))
    cond = jax.random.normal(ks[1], (f, 1, d))
    uncond = jax.random.normal(ks[2], (f, 1, d))
    inpaint = jax.random.normal(ks[3], (f, hl, hl, 4)) * 0.1
    maskl = jnp.ones((f, hl, hl, 1))
    flow = jax.random.normal(ks[4], (f - 1, hl, hl, 2)) * 1.2

    ref, _ = vface_sample(
        model, params, x_T, cond, uncond, cond,
        jnp.zeros((1,) + x_T.shape), inpaint, maskl, spec,
        flow=flow, num_steps=2, drop_recon_chunk=True,
    )
    got = vface_sample_frame_sharded(
        model, params, x_T, cond, uncond, cond, inpaint, maskl, spec,
        flow=flow, mesh=mesh, num_steps=2,
    )
    assert got.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    # window packing: a zeroed pair mask entry (two independent windows in
    # one batch) must match the unsharded path with the same mask
    pm = jnp.ones((f - 1,)).at[f // 2 - 1].set(0.0)
    ref_pm, _ = vface_sample(
        model, params, x_T, cond, uncond, cond,
        jnp.zeros((1,) + x_T.shape), inpaint, maskl, spec,
        flow=flow, num_steps=2, drop_recon_chunk=True, flow_pair_mask=pm,
    )
    got_pm = vface_sample_frame_sharded(
        model, params, x_T, cond, uncond, cond, inpaint, maskl, spec,
        flow=flow, mesh=mesh, num_steps=2, flow_pair_mask=pm,
    )
    np.testing.assert_allclose(np.asarray(got_pm), np.asarray(ref_pm), atol=2e-5)


def test_swap_windows_batched_sharded(tiny_bundle):
    """W independent windows sharded over the 8-device data axis."""
    from vface_tpu.pipelines.video_swap import SwapOptions, VideoSwapPipeline

    model, params = tiny_bundle
    opts = SwapOptions(ddim_steps=2, inversion_steps=2, window=2, image_size=32)
    pipe = VideoSwapPipeline(model, opts)
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    W, F, S = 8, 2, 32
    d = model.cfg.unet.context_dim
    r = jax.random.PRNGKey(1)
    out = pipe.swap_windows_batched(
        params,
        jax.random.normal(r, (W, F, S, S, 3)) * 0.2,
        jnp.ones((W, F, S, S, 1)),
        jax.random.normal(r, (W, F, 1, d)),
        jax.random.normal(r, (W, F, 1, d)),
        jax.random.normal(r, (W, F, 1, d)),
        jax.random.normal(r, (W, F, 1, d)),
        jax.random.normal(r, (W, 1, S, S, 3)) * 0.2,
        jnp.ones((W, 1, S, S, 1)),
        jax.random.normal(r, (W, F - 1, S, S, 2)),
        mesh=mesh,
    )
    assert out.shape == (W, F, S, S, 3)
    assert np.isfinite(np.asarray(out)).all()
    from jax.sharding import PartitionSpec as P

    assert out.sharding.spec == P("data")


def test_zero1_train_step(tiny_bundle):
    """Adam moments shard over the data axis; the sharded train step runs."""
    from vface_tpu.parallel.mesh import zero1_sharding
    from vface_tpu.pipelines.train import TrainConfig, make_optimizer, make_train_step

    model, params0 = tiny_bundle
    mesh = make_mesh()
    tcfg = TrainConfig(reconstruct_steps=2, warmup_steps=10)
    opt = make_optimizer(tcfg, params0)
    opt_state = opt.init(params0)
    oss = zero1_sharding(mesh, opt_state)
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    params = jax.device_put(params0, repl)
    opt_state = jax.device_put(opt_state, oss)
    step = jax.jit(
        make_train_step(model, opt, tcfg),
        in_shardings=(repl, oss, shard, repl),
        out_shardings=(repl, oss, repl),
    )
    b = 8
    sz = model.cfg.cond.clip.image_size
    batch = jax.device_put(
        {
            "gt_image": jnp.zeros((b, 32, 32, 3)),
            "inpaint": jnp.zeros((b, 32, 32, 3)),
            "mask": jnp.ones((b, 32, 32, 1)),
            "ref_clip": jnp.zeros((b, sz, sz, 3)),
            "ref_face01": jnp.zeros((b, 112, 112, 3)),
            "landmarks": jnp.zeros((b, 136)),
        },
        shard,
    )
    params, opt_state, logs = step(params, opt_state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["loss"]))
    # a finite loss is NOT enough: the all-zero batch once produced NaN
    # GRADIENTS through l2-normalised zero embeddings (linalg.norm VJP is
    # 0/0 at 0) while the loss stayed finite — the updated params must be
    # finite or every later step / the dryrun's inference silently NaNs
    bad = [
        k
        for k, l in jax.tree_util.tree_leaves_with_path(params)
        if not bool(jnp.isfinite(l).all())
    ]
    assert not bad, f"non-finite params after one step: {bad[:5]}"
    leaves = [l for l in jax.tree_util.tree_leaves(opt_state) if hasattr(l, "ndim") and l.ndim >= 2]
    assert any(l.sharding.spec != P() for l in leaves)
