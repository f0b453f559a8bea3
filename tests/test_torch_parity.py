"""Numerical parity vs torch (CPU) as an oracle for the reference's semantics.

The reference implements its ops on torch primitives; these tests pin our
re-derivations to the same numerics without porting any reference code:
grid_sample (align_corners=True, border padding), GroupNorm, the 1-D FFT
high/low splice, and AdaIN's unbiased std.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from vface_tpu.models.layers import GroupNorm32  # noqa: E402
from vface_tpu.ops.fusion import adain_fusion_attn, combine_fft_high_low  # noqa: E402
from vface_tpu.ops.warp import grid_sample, warp_by_flow  # noqa: E402


def test_grid_sample_matches_torch():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 9, 11, 3)).astype(np.float32)
    flow = rng.normal(size=(2, 9, 11, 2)).astype(np.float32) * 2.0

    ours = np.asarray(warp_by_flow(jnp.asarray(img), jnp.asarray(flow)))

    # torch: NCHW + normalised grid in [-1, 1]
    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    h, w = 9, 11
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    px = xs[None] + flow[..., 0]
    py = ys[None] + flow[..., 1]
    gx = 2 * px / (w - 1) - 1
    gy = 2 * py / (h - 1) - 1
    grid = torch.from_numpy(np.stack([gx, gy], axis=-1).astype(np.float32))
    ref = torch.nn.functional.grid_sample(
        t_img, grid, mode="bilinear", padding_mode="border", align_corners=True
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_groupnorm_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 8, 8, 64)).astype(np.float32)
    import jax

    gn = GroupNorm32()
    p = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    ours = np.asarray(gn.apply({"params": p}, jnp.asarray(x)))
    t = torch.nn.GroupNorm(32, 64, eps=1e-5)
    with torch.no_grad():
        ref = t(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_fft_splice_matches_torch():
    """combine_fft_high_low == the reference formula computed with torch.fft."""
    rng = np.random.default_rng(2)
    donor = rng.normal(size=(2, 16, 320)).astype(np.float32)
    branch = rng.normal(size=(2, 16, 320)).astype(np.float32)
    split_ratio = 0.8

    ours = np.asarray(
        combine_fft_high_low(jnp.asarray(donor), jnp.asarray(branch), split_ratio)
    )

    td, tb = torch.from_numpy(donor), torch.from_numpy(branch)
    d = donor.shape[-1]
    split = int(d * split_ratio)
    fd = torch.fft.fft(td, dim=-1)
    fb = torch.fft.fft(tb, dim=-1)
    mask = torch.zeros(d)
    mask[:split] = 1.0
    combined = fb * mask + fd * (1 - mask)
    ref = torch.fft.ifft(combined, dim=-1).real.numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)

    # and the MXU circulant path agrees with the FFT path
    from vface_tpu.ops.fusion import combine_fft_high_low_circulant

    circ = np.asarray(
        combine_fft_high_low_circulant(jnp.asarray(donor), jnp.asarray(branch), split_ratio)
    )
    np.testing.assert_allclose(circ, ref, rtol=2e-3, atol=2e-3)


def test_adain_unbiased_std_matches_torch():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(2, 16, 64)).astype(np.float32)
    b = rng.normal(size=(2, 16, 64)).astype(np.float32) * 2 + 1
    ours = np.asarray(adain_fusion_attn(jnp.asarray(a), jnp.asarray(b), normalized=False, alpha=1.0))
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    mean_a = ta.mean(dim=-1, keepdim=True)
    std_a = ta.std(dim=-1, keepdim=True)  # torch default: unbiased
    mean_b = tb.mean(dim=-1, keepdim=True)
    std_b = tb.std(dim=-1, keepdim=True)
    ref = ((ta - mean_a) / (std_a + 1e-5) * std_b + mean_b).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)
