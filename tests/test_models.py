"""Shape/semantics tests for the model zoo (tiny configs, virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vface_tpu.models import (
    AutoencoderKL,
    InjectionSpec,
    ModelConfig,
    UNetConfig,
    UNetModel,
    VAEConfig,
    VFaceModel,
)
from vface_tpu.ops.attention import FusionConfig


@pytest.fixture(scope="module")
def tiny_model(tiny_bundle):
    return tiny_bundle


def test_vae_roundtrip_shapes(tiny_model):
    model, params = tiny_model
    img = jnp.zeros((2, 32, 32, 3))
    z = model.encode_first_stage(params, img)
    assert z.shape == (2, 16, 16, 4)  # tiny ch_mult (1,2) → f=2
    out = model.decode_first_stage(params, z)
    assert out.shape == (2, 32, 32, 3)


def test_unet_forward_and_features(tiny_model):
    model, params = tiny_model
    hl = model.cfg.latent_size
    x9 = jnp.zeros((2, hl, hl, 9))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jnp.zeros((2, 1, model.cfg.unet.context_dim))
    eps = model.apply_model(params, x9, t, ctx)
    assert eps.shape == (2, hl, hl, 4)
    assert eps.dtype == jnp.float32
    eps2, feats = model.apply_model(params, x9, t, ctx, return_features=True)
    # output_blocks count = len(ch_mult) * (num_res_blocks + 1) = 2 * 2 = 4
    assert len(feats) == 4
    np.testing.assert_allclose(np.asarray(eps), np.asarray(eps2))


def test_unet_injection_3chunk(tiny_model):
    """With fusion active, chunk 0 (donor) output is unchanged vs no-fusion."""
    model, params0 = tiny_model
    # zero-init residual convs (SD convention) make the init-time output
    # independent of attention; perturb all params so fusion is observable.
    leaves, treedef = jax.tree_util.tree_flatten(params0["unet"])
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [
        l + 0.02 * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)
    ]
    params = {**params0, "unet": jax.tree_util.tree_unflatten(treedef, leaves)}
    hl = model.cfg.latent_size
    rng = jax.random.PRNGKey(1)
    f = 2
    x9 = jax.random.normal(rng, (3 * f, hl, hl, 9))
    t = jnp.full((3 * f,), 100, jnp.int32)
    ctx = jax.random.normal(rng, (3 * f, 1, model.cfg.unet.context_dim))
    spec = InjectionSpec(
        input_blocks=FusionConfig("fft", split_ratio=0.8), chunks=3
    )
    eps_plain = model.apply_model(params, x9, t, ctx)
    eps_fused = model.apply_model(params, x9, t, ctx, injection=spec)
    assert eps_fused.shape == eps_plain.shape
    # donor chunk (frames 0..f-1) must be bit-identical: fusion leaves chunk 0 alone
    np.testing.assert_allclose(
        np.asarray(eps_fused[:f]), np.asarray(eps_plain[:f]), rtol=2e-4, atol=2e-5
    )
    # fused chunks must differ (injection had an effect)
    assert not np.allclose(np.asarray(eps_fused[f:]), np.asarray(eps_plain[f:]), atol=1e-5)


def test_conditioning_shapes(tiny_model):
    model, params = tiny_model
    sz = model.cfg.cond.clip.image_size
    src = jnp.zeros((2, sz, sz, 3))
    lm = jnp.zeros((2, 136))
    face = jnp.zeros((2, 112, 112, 3))
    c = model.conditioning(params, src, lm, src, face)
    assert c.shape == (2, 1, model.cfg.unet.context_dim)
    uc = model.uncond(params, 2)
    assert uc.shape == (2, 1, model.cfg.unet.context_dim)


def test_q_sample_predict_start_inverse(tiny_model):
    model, params = tiny_model
    rng = jax.random.PRNGKey(0)
    z0 = jax.random.normal(rng, (2, 16, 16, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), z0.shape)
    t = jnp.array([100, 700], jnp.int32)
    zt = model.q_sample(z0, t, noise)
    rec = model.predict_start_from_noise(zt, t, noise)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(z0), rtol=1e-4, atol=1e-4)
