"""DIFT correspondence priors + BFM reconstruction math."""

import jax
import jax.numpy as jnp
import numpy as np

from vface_tpu.eval.bfm import (
    compute_rotation,
    render_coeffs,
    sh_illumination,
    split_coeff,
    splat_render,
)
from vface_tpu.models import ModelConfig, VFaceModel
from vface_tpu.preprocess.dift import correspondences, make_prior


def test_correspondences_identity():
    """Matching a feature map against itself yields the identity mapping."""
    rng = jax.random.PRNGKey(0)
    f = jax.random.normal(rng, (8, 8, 16))
    corr = np.asarray(correspondences(f, f))
    ys, xs = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    np.testing.assert_array_equal(corr[..., 0], xs)
    np.testing.assert_array_equal(corr[..., 1], ys)


def test_make_prior_shapes(tiny_bundle):
    model, params = tiny_bundle
    d = model.cfg.unet.context_dim
    tar = jax.random.normal(jax.random.PRNGKey(1), (32, 32, 3)) * 0.2
    src = jax.random.normal(jax.random.PRNGKey(2), (32, 32, 3)) * 0.2
    prior = make_prior(model, params, tar, src, jnp.zeros((2, 1, d)), t=100)
    assert prior.shape == (32, 32, 3)
    assert np.isfinite(np.asarray(prior)).all()


def test_split_coeff_layout():
    c = split_coeff(jnp.arange(257.0)[None])
    assert float(c.id[0, 0]) == 0 and float(c.exp[0, 0]) == 80
    assert float(c.tex[0, 0]) == 144 and float(c.angle[0, 0]) == 224
    assert float(c.gamma[0, 0]) == 227 and float(c.trans[0, 0]) == 254


def test_rotation_identity_at_zero():
    r = np.asarray(compute_rotation(jnp.zeros((1, 3))))
    np.testing.assert_allclose(r[0], np.eye(3), atol=1e-6)


def test_sh_constant_band():
    """Zero gamma → shading equals the ambient 0.8-offset DC term only."""
    n = jnp.zeros((1, 4, 3)).at[..., 2].set(1.0)
    sh = np.asarray(sh_illumination(n, jnp.zeros((1, 27))))
    # all vertices/channels identical since only the (constant) DC band is lit
    assert np.allclose(sh, sh[0, 0, 0])


def test_splat_render_depth_priority():
    """The nearer of two vertices on the same pixel wins."""
    proj = jnp.asarray([[2.0, 2.0, 5.0], [2.0, 2.0, 1.0]])
    cols = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    img = np.asarray(splat_render(proj, cols, size=4))
    np.testing.assert_allclose(img[2, 2], [0.0, 1.0, 0.0], atol=1e-6)
