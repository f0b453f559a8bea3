"""Golden tests for FSAI fusion ops against independent torch-CPU oracles.

The oracles below are written from the documented semantics (FFT splice along
the channel dim, AdaIN with unbiased std, annulus spectral mask) — they verify
numerics, layout conversion (NCHW->NHWC), and the circulant-matmul fast path.
"""

import numpy as np
import pytest
import torch

from vface_tpu.ops import fusion


def torch_combine_fft_high_low(q1, q2, split_ratio):
    q1, q2 = torch.tensor(q1).float(), torch.tensor(q2).float()
    f1, f2 = torch.fft.fft(q1, dim=-1), torch.fft.fft(q2, dim=-1)
    d = q1.shape[-1]
    split = int(d * split_ratio)
    comb = torch.zeros_like(f1)
    comb[..., :split] = f2[..., :split]
    comb[..., split:] = f1[..., split:]
    return torch.fft.ifft(comb, dim=-1).real.numpy()


@pytest.mark.parametrize("d,ratio", [(320, 0.8), (640, 0.8), (1280, 0.8), (64, 0.5)])
def test_combine_fft_high_low_vs_torch(rng, d, ratio):
    q1 = rng.standard_normal((2, 16, d)).astype(np.float32)
    q2 = rng.standard_normal((2, 16, d)).astype(np.float32)
    ref = torch_combine_fft_high_low(q1, q2, ratio)
    got = np.asarray(fusion.combine_fft_high_low(q1, q2, ratio))
    np.testing.assert_allclose(got, ref, atol=2e-4)


@pytest.mark.parametrize("d,ratio", [(320, 0.8), (1280, 0.8), (64, 0.5), (100, 0.3)])
def test_circulant_path_equals_fft_path(rng, d, ratio):
    q1 = rng.standard_normal((3, 8, d)).astype(np.float32)
    q2 = rng.standard_normal((3, 8, d)).astype(np.float32)
    a = np.asarray(fusion.combine_fft_high_low(q1, q2, ratio))
    b = np.asarray(fusion.combine_fft_high_low_circulant(q1, q2, ratio))
    np.testing.assert_allclose(a, b, atol=3e-4)


def test_combine_fft_identity_when_split_full(rng):
    # split_ratio=1.0 -> everything from branch
    q1 = rng.standard_normal((1, 4, 64)).astype(np.float32)
    q2 = rng.standard_normal((1, 4, 64)).astype(np.float32)
    got = np.asarray(fusion.combine_fft_high_low(q1, q2, 1.0))
    np.testing.assert_allclose(got, q2, atol=1e-5)
    got0 = np.asarray(fusion.combine_fft_high_low(q1, q2, 0.0))
    np.testing.assert_allclose(got0, q1, atol=1e-5)


def torch_fft_fusion(a_nchw, b_nchw, center, center_exclude):
    A, B = torch.tensor(a_nchw).float(), torch.tensor(b_nchw).float()
    fa = torch.fft.fftshift(torch.fft.fft2(A, dim=(-2, -1)), dim=(-2, -1))
    fb = torch.fft.fftshift(torch.fft.fft2(B, dim=(-2, -1)), dim=(-2, -1))
    _, _, H, W = A.shape
    cy, cx = H // 2, W // 2
    Y, X = torch.meshgrid(torch.arange(H), torch.arange(W), indexing="ij")
    dist = torch.sqrt((X - cx) ** 2.0 + (Y - cy) ** 2.0)
    mask = ((dist <= center) & (dist > center_exclude)).float()[None, None]
    comb = fa * (1 - mask) + fb * mask
    comb = torch.fft.ifftshift(comb, dim=(-2, -1))
    return torch.fft.ifft2(comb, dim=(-2, -1)).real.numpy()


def test_fft_fusion_vs_torch(rng):
    a = rng.standard_normal((2, 4, 32, 32)).astype(np.float32)  # NCHW oracle
    b = rng.standard_normal((2, 4, 32, 32)).astype(np.float32)
    ref = torch_fft_fusion(a, b, 16, 3)
    got = np.asarray(fusion.fft_fusion(a.transpose(0, 2, 3, 1), b.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=2e-4)


def test_adain_fusion_attn_vs_torch(rng):
    a = rng.standard_normal((2, 16, 64)).astype(np.float32)
    b = rng.standard_normal((2, 16, 64)).astype(np.float32)
    A, B = torch.tensor(a), torch.tensor(b)
    mean_a, std_a = A.mean(-1, keepdim=True), A.std(-1, keepdim=True)
    mean_b, std_b = B.mean(-1, keepdim=True), B.std(-1, keepdim=True)
    fused = (A - mean_a) / (std_a + 1e-5) * std_b + mean_b
    ref = (fused / (fused.std() + 1e-5)).numpy()
    got = np.asarray(fusion.adain_fusion_attn(a, b, alpha=0.9))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_adain_fusion_latent_vs_torch(rng):
    a = rng.standard_normal((2, 4, 16, 16)).astype(np.float32)  # NCHW oracle
    b = rng.standard_normal((2, 4, 16, 16)).astype(np.float32)
    A, B = torch.tensor(a), torch.tensor(b)
    mean_a, std_a = A.mean((2, 3), keepdim=True), A.std((2, 3), keepdim=True)
    mean_b, std_b = B.mean((2, 3), keepdim=True), B.std((2, 3), keepdim=True)
    fused = (A - mean_a) / (std_a + 1e-5) * (std_b + 1e-5) + mean_b
    ref = ((1 - 0.71) * A + 0.71 * fused).numpy()
    got = np.asarray(
        fusion.adain_fusion(a.transpose(0, 2, 3, 1), b.transpose(0, 2, 3, 1))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_lpf_fusion_vs_torch(rng):
    a = rng.standard_normal((1, 3, 24, 24)).astype(np.float32)
    b = rng.standard_normal((1, 3, 24, 24)).astype(np.float32)
    A, B = torch.tensor(a), torch.tensor(b)
    C = 3
    coords = torch.arange(5, dtype=torch.float32) - 2
    grid = coords[None, :] ** 2 + coords[:, None] ** 2
    kernel = torch.exp(-grid / 2.0)
    kernel = (kernel / kernel.sum()).view(1, 1, 5, 5).repeat(C, 1, 1, 1)
    blur = lambda x: torch.nn.functional.conv2d(x, kernel, padding=2, groups=C)
    ref = (blur(A) + B - blur(B)).numpy()
    got = np.asarray(
        fusion.lpf_fusion(a.transpose(0, 2, 3, 1), b.transpose(0, 2, 3, 1))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_temporal_gaussian_matches_loop_oracle(rng):
    x = rng.standard_normal((6, 4, 8)).astype(np.float32)
    window, sigma = 5, 1.0
    pad = window // 2
    offsets = np.arange(-pad, pad + 1, dtype=np.float32)
    gauss = np.exp(-0.5 * (offsets / sigma) ** 2)
    gauss = gauss / gauss.sum()
    ref = np.zeros_like(x)
    for t in range(6):
        acc, tot = 0.0, 0.0
        for i, off in enumerate(offsets):
            idx = t + int(off)
            if 0 <= idx < 6:
                acc = acc + gauss[i] * x[idx]
                tot += gauss[i]
        ref[t] = acc / tot
    got = np.asarray(fusion.temporal_gaussian(x, window, sigma))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_mix():
    a = np.full((2, 2), 2.0, np.float32)
    b = np.zeros((2, 2), np.float32)
    np.testing.assert_allclose(np.asarray(fusion.mix(a, b, alpha=0.5)), 1.0)


def test_fuse_qkv_bystander_rows_untouched(rng):
    """FusionConfig.bystander excludes trailing rows from fusion entirely
    (the pipelined pack's inversion sub-batch): the fused part equals a
    bystander-free call and the trailing rows pass through bit-identically."""
    import jax.numpy as jnp

    from vface_tpu.ops.attention import FusionConfig, fuse_qkv

    f, g, n, d = 3, 2, 16, 8
    q = jnp.asarray(rng.normal(size=(2 * f + g, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2 * f + g, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2 * f + g, n, d)).astype(np.float32))
    flow = jnp.asarray(rng.normal(size=(f - 1, 4, 4, 2)).astype(np.float32))
    for mode in ("fft", "flow_fix", "adain", "mix", "replace", "fft_vfixed"):
        cfg = FusionConfig(
            mode, two_chunk_replace=False, bystander=g, flow_tokens=n
        )
        q2, k2, v2, carry = fuse_qkv(q, k, v, cfg, chunks=2, flow=flow)
        base = FusionConfig(mode, two_chunk_replace=False, flow_tokens=n)
        q0, k0, v0, carry0 = fuse_qkv(
            q[:-g], k[:-g], v[:-g], base, chunks=2, flow=flow
        )
        np.testing.assert_array_equal(np.asarray(q2[:-g]), np.asarray(q0), err_msg=mode)
        np.testing.assert_array_equal(np.asarray(k2[:-g]), np.asarray(k0), err_msg=mode)
        np.testing.assert_array_equal(np.asarray(v2[:-g]), np.asarray(v0), err_msg=mode)
        np.testing.assert_array_equal(np.asarray(q2[-g:]), np.asarray(q[-g:]), err_msg=mode)
        np.testing.assert_array_equal(np.asarray(k2[-g:]), np.asarray(k[-g:]), err_msg=mode)
        np.testing.assert_array_equal(np.asarray(v2[-g:]), np.asarray(v[-g:]), err_msg=mode)
