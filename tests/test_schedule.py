"""Golden tests for schedule tables against the published LDM formulas."""

import numpy as np

from vface_tpu.utils.schedule import (
    DDIMSchedule,
    DiffusionSchedule,
    make_beta_schedule,
    make_ddim_timesteps,
    timestep_embedding,
)


def test_linear_betas_match_sqrt_formula():
    betas = make_beta_schedule("linear", 1000, 0.00085, 0.0120)
    ref = np.linspace(0.00085**0.5, 0.0120**0.5, 1000) ** 2
    np.testing.assert_allclose(betas, ref, rtol=1e-12)
    assert betas[0] == 0.00085 and abs(betas[-1] - 0.0120) < 1e-12


def test_ddim_timesteps_uniform_50():
    ts = make_ddim_timesteps(50, 1000)
    assert ts.shape == (50,)
    # reference util.py:46-60: [1, 21, ..., 961, 981]; the video driver's
    # start code is the SECOND-to-last entry (ddim_latents_961.pt, :541)
    assert ts[0] == 1 and ts[-1] == 981 and ts[-2] == 961
    assert np.all(np.diff(ts) == 20)


def test_ddim_alpha_tables():
    base = DiffusionSchedule.create(timesteps=1000)
    dd = DDIMSchedule.create(base, 50)
    # a_t = alphas_cumprod[ts], a_prev shifted with alphas_cumprod[0] prepended
    np.testing.assert_allclose(dd.alphas, base.alphas_cumprod[dd.timesteps], rtol=1e-6)
    np.testing.assert_allclose(dd.alphas_prev[1:], base.alphas_cumprod[dd.timesteps[:-1]], rtol=1e-6)
    np.testing.assert_allclose(dd.alphas_prev[0], base.alphas_cumprod[0], rtol=1e-6)
    # eta=0 -> sigmas all zero
    np.testing.assert_allclose(dd.sigmas, 0.0)
    # inversion tables: alpha_cur[i] = acp[max(0, ts[i]-20)]
    np.testing.assert_allclose(
        dd.inv_alpha_cur, base.alphas_cumprod[np.maximum(0, dd.timesteps - 20)], rtol=1e-6
    )
    np.testing.assert_allclose(dd.inv_alpha_next, base.alphas_cumprod[dd.timesteps], rtol=1e-6)


def test_ddim_eta_sigma_formula():
    base = DiffusionSchedule.create(timesteps=1000)
    dd = DDIMSchedule.create(base, 50, eta=1.0)
    a, ap = dd.alphas.astype(np.float64), dd.alphas_prev.astype(np.float64)
    ref = np.sqrt((1 - ap) / (1 - a) * (1 - a / ap))
    np.testing.assert_allclose(dd.sigmas, ref, rtol=1e-5)


def test_timestep_embedding_matches_formula():
    import jax.numpy as jnp

    t = jnp.asarray([0, 1, 500, 999])
    emb = np.asarray(timestep_embedding(t, 320))
    half = 160
    freqs = np.exp(-np.log(10000) * np.arange(half) / half)
    args = np.asarray(t)[:, None] * freqs[None]
    ref = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    # float32 cos/sin of args up to ~999 carries ~arg*eps rounding: loose atol
    np.testing.assert_allclose(emb, ref, rtol=0, atol=2e-3)
    assert emb.shape == (4, 320)


def test_alphas_cumprod_monotone():
    base = DiffusionSchedule.create(timesteps=1000)
    assert np.all(np.diff(base.alphas_cumprod) < 0)
    assert base.alphas_cumprod[0] > 0.999 - 0.001
    np.testing.assert_allclose(
        base.sqrt_one_minus_alphas_cumprod**2 + base.sqrt_alphas_cumprod**2,
        1.0,
        atol=1e-5,
    )
