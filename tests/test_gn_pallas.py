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


def test_gn_block_budget_bounds_vmem_stack():
    """Regression: the UNet in_norm shape (24, 64, 64, 320) OOMed the 16 MB
    scoped-VMEM stack on a real v5e at the old 4 MB block budget (18.16 MB
    stack — bf16 block double-buffered plus two fp32 temporaries). Pin the
    stack model ≤ 12 MB for every production shape so budget regressions are
    caught off-chip."""
    from vface_tpu.models.layers import _GN_BLOCK_BUDGET

    shapes = [
        (24, 64, 64, 320),   # UNet ds1 in_norm, super-pack b=24
        (24, 128, 128, 256), # UNet-scale upsampled
        (12, 512, 512, 128), # VAE decode stages (per-half b=12)
        (24, 256, 256, 128),
        (6, 512, 512, 128),
    ]
    for b, h, w, c in shapes:
        hc = h
        while b * hc * w * c * 2 > _GN_BLOCK_BUDGET and hc % 2 == 0:
            hc //= 2
        block = b * hc * w * c * 2
        # stack model from the v5e OOM report: 2× bf16 block (double
        # buffering) + 2× fp32 temporaries (cast, square) + outputs
        stack = 2 * block + 2 * 2 * block + 2 * b * c * 4
        assert stack <= 12 * 1024 * 1024, (b, h, w, c, stack)


def test_gn_pallas_gated_to_big_spatial():
    """The kernel's win is the VAE's big-spatial reduce pathology; the UNet's
    ≤64² sites must stay on XLA's reduce (measured 87% MXU backbone, and the
    kernel OOMed scoped VMEM there at b=24)."""
    import numpy as np

    from vface_tpu.models.layers import _gn_pallas_eligible

    unet = jnp.zeros((24, 64, 64, 320), jnp.bfloat16)
    assert not _gn_pallas_eligible(unet)
    # VAE-shape eligibility is platform-gated; assert the spatial gate alone
    vae = jnp.zeros((12, 512, 512, 128), jnp.bfloat16)
    b, h, w, c = vae.shape
    assert h * w >= (1 << 14) and h * w * b * c >= (1 << 21)


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
