"""Pallas GroupNorm statistics kernel (vface_tpu.models.layers._gn_sums).

The VAE decoder spends 167 of its 315 ms in XLA's spatial reduce at
(B, 512, 512, 128) (scripts/bench_vae_ablate.py, bench_gn_micro.py); the
kernel computes both GN sums in one VMEM pass. On-CPU validation runs the
kernel in interpret mode: same math, so forward values match XLA's f32
reductions to reassociation error and the custom backward is exact.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vface_tpu.models.layers import _gn_sums, _gn_sums_pallas


def _ref_sums(x):
    x32 = x.astype(jnp.float32)
    return jnp.sum(x32, axis=(1, 2)), jnp.sum(x32 * x32, axis=(1, 2))


def test_gn_sums_forward_matches_xla():
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 16, 16, 128)), jnp.bfloat16
    )
    s1, s2 = _gn_sums(x, True)
    r1, r2 = _ref_sums(x)
    np.testing.assert_allclose(s1, r1, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(s2, r2, rtol=1e-5, atol=1e-3)


def test_gn_sums_multiblock_accumulation():
    """A tiny block budget forces the grid >1 so the j>0 accumulation branch
    is exercised (production hits it at the VAE's 512² activations)."""
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 32, 16, 128)), jnp.float32
    )
    budget = 2 * 8 * 16 * 128 * 4  # exactly 4 row-blocks of 8
    s1, s2 = _gn_sums_pallas(x, interpret=True, block_budget=budget)
    r1, r2 = _ref_sums(x)
    np.testing.assert_allclose(s1, r1, rtol=1e-6, atol=1e-4)
    np.testing.assert_allclose(s2, r2, rtol=1e-6, atol=1e-3)


def test_gn_sums_backward_exact():
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 8, 8, 128)), jnp.float32
    )

    def via_kernel(xx):
        s1, s2 = _gn_sums(xx, True)
        return jnp.sum(s1 * 1.5 + s2 * 0.5)

    def via_xla(xx):
        s1, s2 = _ref_sums(xx)
        return jnp.sum(s1 * 1.5 + s2 * 0.5)

    g = jax.grad(via_kernel)(x)
    ref = jax.grad(via_xla)(x)
    np.testing.assert_allclose(g, ref, rtol=1e-6, atol=1e-6)
