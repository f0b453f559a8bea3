"""Sampler math + end-to-end tiny sampling tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vface_tpu.models import InjectionSpec, ModelConfig, VFaceModel
from vface_tpu.ops.attention import FusionConfig
from vface_tpu.samplers import ddim_invert, ddim_sample, plms_sample, vface_sample
from vface_tpu.samplers.ddim import ddim_step
from vface_tpu.utils.schedule import DDIMSchedule, DiffusionSchedule


@pytest.fixture(scope="module")
def tiny(tiny_bundle):
    model, params = tiny_bundle
    hl = model.cfg.latent_size
    f = 2
    d = model.cfg.unet.context_dim
    rng = jax.random.PRNGKey(1)
    data = dict(
        x=jax.random.normal(rng, (f, hl, hl, 4)),
        inpaint=jax.random.normal(jax.random.PRNGKey(2), (f, hl, hl, 4)),
        mask=jnp.ones((f, hl, hl, 1)),
        cond=jax.random.normal(jax.random.PRNGKey(3), (f, 1, d)),
        uncond=jax.random.normal(jax.random.PRNGKey(4), (f, 1, d)),
        tar_cond=jax.random.normal(jax.random.PRNGKey(5), (f, 1, d)),
    )
    return model, params, data


def test_ddim_step_is_identity_at_no_noise():
    """With a_t == a_prev and sigma 0, the update returns x when e_t matches."""
    x = jnp.ones((1, 4, 4, 4))
    e = jnp.zeros_like(x)
    x_prev, pred_x0 = ddim_step(x, e, 0.5, 0.5, np.sqrt(0.5), 0.0, jnp.zeros_like(x))
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(x), rtol=1e-5)


def test_ddim_sample_shapes(tiny):
    model, params, d = tiny
    z0, traj = ddim_sample(
        model, params, d["x"], d["cond"], d["uncond"], d["inpaint"], d["mask"],
        num_steps=4, cfg_scale=3.0,
    )
    assert z0.shape == d["x"].shape
    assert traj.shape == (4,) + d["x"].shape
    assert np.isfinite(np.asarray(z0)).all()


def test_inversion_roundtrip_structure(tiny):
    """Inversion stack has S entries; last entry equals returned x_T[:keep]."""
    model, params, d = tiny
    x_T, lat = ddim_invert(
        model, params, d["x"], d["cond"], d["inpaint"], d["mask"], num_steps=4
    )
    assert lat.shape == (4,) + d["x"].shape
    np.testing.assert_allclose(np.asarray(lat[-1]), np.asarray(x_T), rtol=1e-5)


def test_inversion_alpha_indexing():
    """inv tables follow ddim_w_inv.py:442-449 custom indexing."""
    base = DiffusionSchedule.create(timesteps=1000)
    sch = DDIMSchedule.create(base, 50)
    ts = sch.timesteps
    np.testing.assert_allclose(sch.inv_alpha_next, base.alphas_cumprod[ts], rtol=1e-6)
    cur = np.maximum(0, ts - 1000 // 50)
    np.testing.assert_allclose(sch.inv_alpha_cur, base.alphas_cumprod[cur], rtol=1e-6)


def test_vface_sample_full_loop(tiny):
    """invert → 3-chunk hooked sample runs end-to-end and stays finite."""
    model, params, d = tiny
    steps = 4
    x_T, lat = ddim_invert(
        model, params, d["x"], d["tar_cond"], d["inpaint"], d["mask"], num_steps=steps
    )
    spec = InjectionSpec(input_blocks=FusionConfig("fft"), chunks=3)
    z0, traj = vface_sample(
        model, params, x_T, d["cond"], d["uncond"], d["tar_cond"], lat,
        d["inpaint"], d["mask"], spec, flow=None, num_steps=steps, cfg_scale=3.0,
    )
    assert z0.shape == d["x"].shape
    assert np.isfinite(np.asarray(z0)).all()


def test_plms_sample_shapes(tiny):
    model, params, d = tiny
    z0, traj = plms_sample(
        model, params, d["x"], d["cond"], d["uncond"], d["inpaint"], d["mask"],
        num_steps=4, cfg_scale=3.0,
    )
    assert z0.shape == d["x"].shape
    assert np.isfinite(np.asarray(z0)).all()
