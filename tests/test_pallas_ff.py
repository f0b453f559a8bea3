"""Fused GEGLU FeedForward (ops/pallas_ff.py): exactness, grads, param tree.

Reference semantics: `/root/reference/REFace/ldm/modules/attention.py:37-58`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vface_tpu.models.unet import FeedForward
from vface_tpu.ops.pallas_ff import _ref_impl, geglu_ff


def _operands(dtype, m=700, c=96, mult=4, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    inner = c * mult
    x = jax.random.normal(ks[0], (m, c), dtype)
    wp = (jax.random.normal(ks[1], (c, 2 * inner)) * 0.05).astype(dtype)
    bp = (jax.random.normal(ks[2], (2 * inner,)) * 0.01).astype(dtype)
    wo = (jax.random.normal(ks[3], (inner, c)) * 0.05).astype(dtype)
    bo = (jax.random.normal(ks[4], (c,)) * 0.01).astype(dtype)
    return x, wp, bp, wo, bo


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_reference(dtype):
    # m=700 exercises the tail-padding path (700 % 512 != 0)
    ops = _operands(dtype)
    got = geglu_ff(*ops, interpret=True)
    want = _ref_impl(*ops)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-6 if dtype == jnp.float32 else 2e-2,
        atol=2e-6 if dtype == jnp.float32 else 2e-2,
    )


def test_leading_dims_and_fallback():
    x, wp, bp, wo, bo = _operands(jnp.float32, m=6 * 50)
    x3 = x.reshape(6, 50, -1)
    out = geglu_ff(x3, wp, bp, wo, bo)  # CPU → XLA fallback branch
    assert out.shape == (6, 50, x.shape[-1])
    np.testing.assert_allclose(
        np.asarray(out.reshape(300, -1)), np.asarray(_ref_impl(x, wp, bp, wo, bo)),
        rtol=1e-6, atol=1e-6,
    )


def test_custom_vjp_matches_reference_grads():
    ops = _operands(jnp.float32, m=64, c=32, mult=2)

    def loss_fused(*o):
        return jnp.sum(jnp.sin(geglu_ff(*o, interpret=True)))

    def loss_ref(*o):
        return jnp.sum(jnp.sin(_ref_impl(*o)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*ops)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*ops)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_feedforward_param_tree_compatible():
    """use_fused=True/False share one param dict and one output."""
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 40, 48))
    ff_ref = FeedForward(48, dtype=jnp.float32, use_fused=False)
    ff_fused = FeedForward(48, dtype=jnp.float32, use_fused=True)
    params = ff_ref.init(jax.random.PRNGKey(2), x)
    flat_ref = jax.tree_util.tree_structure(params)
    params_fused = ff_fused.init(jax.random.PRNGKey(2), x)
    assert jax.tree_util.tree_structure(params_fused) == flat_ref
    out_ref = ff_ref.apply(params, x)
    out_fused = ff_fused.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), rtol=1e-6, atol=1e-6
    )


def test_wide_kernel_matches_reference():
    """Inner-blocked wide kernel (ds4: C>768) == the XLA reference to
    k-split reassociation error (fp32 partial-sum accumulation)."""
    from vface_tpu.ops.pallas_ff import _pallas_impl_wide, _ref_impl

    rng = np.random.default_rng(5)
    m, c = 160, 1024  # wide-C shape; inner=4096, 8 inner blocks of 512
    x = jnp.asarray(rng.normal(size=(m, c)) * 0.1, jnp.bfloat16)
    wp = jnp.asarray(rng.normal(size=(c, 8 * c)) * 0.02, jnp.bfloat16)
    bp = jnp.asarray(rng.normal(size=(8 * c,)) * 0.01, jnp.bfloat16)
    wo = jnp.asarray(rng.normal(size=(4 * c, c)) * 0.02, jnp.bfloat16)
    bo = jnp.asarray(rng.normal(size=(c,)) * 0.01, jnp.bfloat16)
    got = _pallas_impl_wide(x, wp, bp, wo, bo, True)
    ref = _ref_impl(x, wp, bp, wo, bo)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.03, atol=0.03,
    )
