"""face_vid2vid, VQ first stage, EMA, dataset variants."""

import jax
import jax.numpy as jnp
import numpy as np


def test_face_vid2vid_forward():
    from vface_tpu.models.face_vid2vid import FV2VConfig, OcclusionAwareGenerator

    gen = OcclusionAwareGenerator(FV2VConfig.tiny())
    src = jnp.zeros((1, 32, 32, 3))
    drv = jnp.ones((1, 32, 32, 3)) * 0.5
    p = gen.init(jax.random.PRNGKey(0), src, drv)["params"]
    out = gen.apply({"params": p}, src, drv)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    kp = gen.apply({"params": p}, src, method=type(gen).extract_kp)
    assert kp.shape == (1, 5, 3)


def test_vq_model_roundtrip():
    from vface_tpu.models.vq import VQConfig, VQModel

    m = VQModel(VQConfig.tiny())
    x = jnp.zeros((1, 32, 32, 3))
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    out, loss = m.apply({"params": p}, x)
    assert out.shape == x.shape and np.isfinite(float(loss))
    h = m.apply({"params": p}, x, method=VQModel.encode)
    assert h.shape == (1, 16, 16, 4)  # pre-quant latent (VQModelInterface)
    dec = m.apply({"params": p}, h, method=VQModel.decode)
    assert dec.shape == x.shape


def test_ema_warmup_and_convergence():
    from vface_tpu.utils.ema import ema_init, ema_update

    p0 = {"w": jnp.zeros(4)}
    state = ema_init(p0)
    target = {"w": jnp.ones(4)}
    # first update: decay = min(0.9999, 2/11)
    state = ema_update(state, target)
    np.testing.assert_allclose(np.asarray(state.params["w"]), (1 - 2 / 11) * np.ones(4), rtol=1e-5)
    for _ in range(500):
        state = ema_update(state, target)
    assert float(jnp.abs(state.params["w"] - 1.0).max()) < 0.05


def test_ffhq_dataset_and_ff_pairs_empty_dirs(tmp_path):
    from vface_tpu.data.datasets import FFHQTrainDataset, ff_test_pairs

    ds = FFHQTrainDataset(str(tmp_path))
    assert len(ds) == 0
    assert list(ff_test_pairs(str(tmp_path))) == []


def test_ffhq_dataset_item(tmp_path):
    from PIL import Image

    from vface_tpu.data.datasets import FFHQTrainDataset

    (tmp_path / "images512").mkdir()
    (tmp_path / "BiSeNet_mask").mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)).save(
            tmp_path / "images512" / f"{i:05d}.png"
        )
        Image.fromarray(rng.integers(0, 12, (64, 64), dtype=np.uint8)).save(
            tmp_path / "BiSeNet_mask" / f"{i:05d}.png"
        )
    ds = FFHQTrainDataset(str(tmp_path), image_size=32)
    assert len(ds) == 2
    item = ds[0]
    assert item["gt_image"].shape == (32, 32, 3)
    assert item["mask"].shape == (32, 32, 1)
    assert item["ref_image01"].shape == (224, 224, 3)
    # decow warps the mask with bilinear sampling and no thresholding
    # (celebA.py:83-96 grid_sampler_2d) — continuous values in [0, 1]
    m = item["mask"]
    assert float(m.min()) >= -1e-4 and float(m.max()) <= 1.0 + 1e-4


def test_vae_train_step():
    """First-stage G/D training step runs and produces finite losses."""
    import optax

    from vface_tpu.models.vae import AutoencoderKL, VAEConfig
    from vface_tpu.pipelines.vae_train import (
        PatchDiscriminator,
        VAELossConfig,
        make_vae_train_step,
    )

    vae = AutoencoderKL(VAEConfig.tiny())
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3)) * 0.5
    params = vae.init(jax.random.PRNGKey(1), img)["params"]
    dp = PatchDiscriminator().init(jax.random.PRNGKey(2), img)["params"]
    g_opt, d_opt = optax.adam(1e-4), optax.adam(1e-4)
    gs, ds = g_opt.init(params), d_opt.init(dp)
    step = jax.jit(make_vae_train_step(vae, g_opt, d_opt, VAELossConfig(disc_start=0)))
    params, dp, gs, ds, logs = step(params, dp, gs, ds, img, jax.random.PRNGKey(3), 1)
    for k, v in logs.items():
        assert np.isfinite(float(v)), k
    # discriminator warmup: before disc_start the GAN term must not move G loss
    step2 = jax.jit(make_vae_train_step(vae, g_opt, d_opt, VAELossConfig(disc_start=10**9)))
    _, _, _, _, logs2 = step2(params, dp, gs, ds, img, jax.random.PRNGKey(4), 1)
    assert abs(float(logs2["vae/loss"]) - (float(logs2["vae/rec"]) + 1e-6 * float(logs2["vae/kl"]))) < 1e-4


def test_trainable_mask_matches_reference(tiny_bundle):
    """Frozen set per ddpm.py:2175-2220 + the CLIP freeze list: VAE, ArcFace
    and the CLIP vision tower stay fixed; UNet + heads train."""
    import optax

    from vface_tpu.pipelines.train import TrainConfig, make_optimizer, trainable_mask

    model, params = tiny_bundle
    mask = trainable_mask(params)
    assert not any(jax.tree_util.tree_leaves(mask["vae"]))
    assert not any(jax.tree_util.tree_leaves(mask["cond"]["arcface"]))
    assert not any(jax.tree_util.tree_leaves(mask["cond"]["clip_encoder"]["vision"]))
    assert all(jax.tree_util.tree_leaves(mask["unet"]))
    assert all(jax.tree_util.tree_leaves(mask["cond"]["clip_encoder"]["final_ln2"]))
    assert mask["cond"]["learnable_vector"]
    # partial-UNet filter: only attn2/norm2 params (ddpm.py partial training)
    pm = trainable_mask(params, partial_unet=True)
    leaves = jax.tree_util.tree_flatten_with_path(pm["unet"])[0]
    for kp, v in leaves:
        names = [getattr(p, "key", "") for p in kp]
        expect = any(n in ("attn2", "norm2") for n in names)
        assert v == expect, names
    # frozen leaves receive zero updates through the optimizer
    tx = make_optimizer(TrainConfig(), params)
    st = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    ups, _ = tx.update(grads, st, params)
    assert float(jnp.abs(ups["vae"]["encoder"]["conv_in"]["Conv_0"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(ups["unet"]["conv_in"]["Conv_0"]["kernel"]).max()) > 0.0
