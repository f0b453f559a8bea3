"""Encoder propagation ("Faster Diffusion") — cache correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vface_tpu.models import InjectionSpec, ModelConfig, VFaceModel
from vface_tpu.ops.attention import FusionConfig
from vface_tpu.samplers import ddim_invert, vface_sample


@pytest.fixture(scope="module")
def perturbed_model(tiny_bundle):
    model, params = tiny_bundle
    leaves, td = jax.tree_util.tree_flatten(params["unet"])
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = {
        **params,
        "unet": jax.tree_util.tree_unflatten(
            td, [l + 0.02 * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)]
        ),
    }
    return model, params


def test_cache_roundtrip_is_exact(perturbed_model):
    """Feeding back a just-computed cache at the same t reproduces the output."""
    model, params = perturbed_model
    hl = model.cfg.latent_size
    d = model.cfg.unet.context_dim
    x9 = jax.random.normal(jax.random.PRNGKey(1), (2, hl, hl, 9))
    t = jnp.full((2,), 500, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 1, d))
    out_full, cache = model.apply_model(params, x9, t, ctx, return_encoder_cache=True)
    out_cached, _ = model.apply_model(
        params, x9, t, ctx, encoder_cache=cache, return_encoder_cache=True
    )
    np.testing.assert_allclose(np.asarray(out_cached), np.asarray(out_full), rtol=1e-5, atol=1e-6)


def test_sampler_interval_one_unchanged(perturbed_model):
    """encoder_interval=1 must be bit-identical to the default path."""
    model, params = perturbed_model
    hl = model.cfg.latent_size
    d = model.cfg.unet.context_dim
    f = 2
    x = jax.random.normal(jax.random.PRNGKey(1), (f, hl, hl, 4))
    inp = jax.random.normal(jax.random.PRNGKey(2), (f, hl, hl, 4))
    msk = jnp.ones((f, hl, hl, 1))
    c = jax.random.normal(jax.random.PRNGKey(3), (f, 1, d))
    u = jax.random.normal(jax.random.PRNGKey(4), (f, 1, d))
    tc = jax.random.normal(jax.random.PRNGKey(5), (f, 1, d))
    x_T, lat = ddim_invert(model, params, x, tc, inp, msk, num_steps=4)
    spec = InjectionSpec(input_blocks=FusionConfig("fft"), chunks=3)
    args = (model, params, x_T, c, u, tc, lat, inp, msk, spec)
    z_ref, _ = vface_sample(*args, num_steps=4)
    z_one, _ = vface_sample(*args, num_steps=4, encoder_interval=1)
    np.testing.assert_array_equal(np.asarray(z_ref), np.asarray(z_one))
    # interval 2 diverges slightly (the approximation) but stays finite/close
    z_two, _ = vface_sample(*args, num_steps=4, encoder_interval=2)
    assert np.isfinite(np.asarray(z_two)).all()
    rel = float(jnp.abs(z_two - z_ref).mean() / (jnp.abs(z_ref).mean() + 1e-8))
    assert 0 < rel < 0.5


def test_recon_chunk_is_dead_compute(perturbed_model):
    """Dropping the TSG recon chunk is bit-identical: the fusion donor is
    chunk 0 for every mode (pnp_utils.py:92-200) and e_t_recon is discarded
    (ddim_w_inv.py:668, 705-710)."""
    model, params = perturbed_model
    hl = model.cfg.latent_size
    d = model.cfg.unet.context_dim
    f = 2
    x = jax.random.normal(jax.random.PRNGKey(1), (f, hl, hl, 4))
    inp = jax.random.normal(jax.random.PRNGKey(2), (f, hl, hl, 4))
    msk = jnp.ones((f, hl, hl, 1))
    c = jax.random.normal(jax.random.PRNGKey(3), (f, 1, d))
    u = jax.random.normal(jax.random.PRNGKey(4), (f, 1, d))
    tc = jax.random.normal(jax.random.PRNGKey(5), (f, 1, d))
    flow = jax.random.normal(jax.random.PRNGKey(6), (f - 1, hl, hl, 2))
    x_T, lat = ddim_invert(model, params, x, tc, inp, msk, num_steps=4)
    spec = InjectionSpec(
        input_blocks=FusionConfig("flow_fix", flow_tokens=hl * hl), chunks=3
    )
    args = (model, params, x_T, c, u, tc, lat, inp, msk, spec)
    z3, _ = vface_sample(*args, flow=flow, num_steps=4)
    z2, _ = vface_sample(*args, flow=flow, num_steps=4, drop_recon_chunk=True)
    np.testing.assert_array_equal(np.asarray(z3), np.asarray(z2))


def test_encoder_key_schedule_denser_early():
    """Key steps are dense for the first ~20% of iterations, then spaced by
    the interval ("Faster Diffusion" non-uniform schedule); interval=1 is
    all-keys (exact)."""
    from vface_tpu.samplers.vface import encoder_key_steps

    keys = np.asarray(encoder_key_steps(50, 5))
    assert keys[:11].all()           # dense head (20% of 50 = 10, inclusive)
    assert not keys[11] and not keys[14]
    assert keys[15] and keys[20]     # spaced by 5 afterwards
    assert 15 <= keys.sum() <= 25    # real savings vs 50 full passes
    assert np.asarray(encoder_key_steps(50, 1)).all()


def test_stale_cache_is_actually_used(perturbed_model):
    """A cache from a DIFFERENT input must change the output (i.e. the cache
    is consumed, not silently ignored) and must reproduce the cache-owner's
    output at the same (t, context) — output blocks depend only on the cache.

    Regression guard: with the zero-initialised out_conv of a fresh init,
    every eps is exactly 0 and a cache-ignoring bug would be invisible to
    trajectory-level comparisons (found while measuring the approx bound)."""
    model, params = perturbed_model
    hl = model.cfg.latent_size
    d = model.cfg.unet.context_dim
    t = jnp.full((2,), 500, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 1, d))
    x_a = jax.random.normal(jax.random.PRNGKey(3), (2, hl, hl, 9))
    x_b = jax.random.normal(jax.random.PRNGKey(4), (2, hl, hl, 9)) * 2.0
    out_a, cache_a = model.apply_model(params, x_a, t, ctx, return_encoder_cache=True)
    out_b_full, _ = model.apply_model(params, x_b, t, ctx, return_encoder_cache=True)
    out_b_stale, cache_through = model.apply_model(
        params, x_b, t, ctx, encoder_cache=cache_a, return_encoder_cache=True
    )
    # consumed: stale-cache output tracks the cache owner, not the new input
    np.testing.assert_allclose(np.asarray(out_b_stale), np.asarray(out_a), rtol=1e-5, atol=1e-6)
    assert float(jnp.abs(out_b_stale - out_b_full).max()) > 1e-4
    # passthrough: a cached call returns the cache unchanged
    for got, want in zip(
        jax.tree_util.tree_leaves(cache_through), jax.tree_util.tree_leaves(cache_a)
    ):
        assert (np.asarray(got) == np.asarray(want)).all()
