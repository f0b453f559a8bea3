"""Golden tests for grid sampling / flow warps against torch.grid_sample."""

import numpy as np
import torch
import torch.nn.functional as F

from vface_tpu.ops import warp


def torch_warp(img_nchw, flow_nchw):
    """Reference warp_image (temporal_flow.py:40-53): align_corners=True, border."""
    img = torch.tensor(img_nchw).float()
    flow = torch.tensor(flow_nchw).float()
    B, C, H, W = img.shape
    ys, xs = torch.meshgrid(torch.arange(H).float(), torch.arange(W).float(), indexing="ij")
    grid = torch.stack([xs, ys])[None]  # (1, 2, H, W)
    vgrid = grid + flow
    vgrid[:, 0] = 2.0 * vgrid[:, 0] / max(W - 1, 1) - 1.0
    vgrid[:, 1] = 2.0 * vgrid[:, 1] / max(H - 1, 1) - 1.0
    vgrid = vgrid.permute(0, 2, 3, 1)
    return F.grid_sample(img, vgrid, align_corners=True, padding_mode="border").numpy()


def test_warp_by_flow_vs_torch(rng):
    img = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    flow = (rng.standard_normal((2, 16, 16, 2)) * 3).astype(np.float32)
    ref = torch_warp(img.transpose(0, 3, 1, 2), flow.transpose(0, 3, 1, 2))
    got = np.asarray(warp.warp_by_flow(img, flow)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_warp_zero_flow_is_identity(rng):
    img = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    np.testing.assert_allclose(np.asarray(warp.warp_by_flow(img, flow)), img, atol=1e-6)


def test_warp_integer_shift(rng):
    img = rng.standard_normal((1, 8, 8, 1)).astype(np.float32)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    flow[..., 0] = 1.0  # sample from x+1
    got = np.asarray(warp.warp_by_flow(img, flow))
    np.testing.assert_allclose(got[0, :, :-1], img[0, :, 1:], atol=1e-6)
    # border clamp on last column
    np.testing.assert_allclose(got[0, :, -1], img[0, :, -1], atol=1e-6)


def test_align_by_flow_parallel_semantics(rng):
    """out[i+1] = a*x[i+1] + (1-a)*warp(x[i]) with the ORIGINAL x[i] (no chain)."""
    x = rng.standard_normal((4, 8, 8, 2)).astype(np.float32)
    flow = (rng.standard_normal((3, 8, 8, 2)) * 2).astype(np.float32)
    alpha = 0.8
    got = np.asarray(warp.align_by_flow(x, flow, alpha))
    np.testing.assert_allclose(got[0], x[0], atol=1e-6)
    for i in range(3):
        w = np.asarray(warp.warp_by_flow(x[i : i + 1], flow[i : i + 1]))[0]
        np.testing.assert_allclose(got[i + 1], alpha * x[i + 1] + (1 - alpha) * w, atol=1e-5)


def test_align_by_flow_chain_recurrence(rng):
    x = rng.standard_normal((3, 6, 6, 2)).astype(np.float32)
    flow = (rng.standard_normal((2, 6, 6, 2))).astype(np.float32)
    alpha = 0.5
    got = np.asarray(warp.align_by_flow_chain(x, flow, alpha))
    prev = x[0]
    np.testing.assert_allclose(got[0], prev, atol=1e-6)
    for i in range(2):
        w = np.asarray(warp.warp_by_flow(prev[None], flow[i : i + 1]))[0]
        prev = alpha * x[i + 1] + (1 - alpha) * w
        np.testing.assert_allclose(got[i + 1], prev, atol=1e-5)


def test_resize_flow_scales_magnitude():
    flow = np.ones((1, 16, 16, 2), np.float32) * 8.0
    out = np.asarray(warp.resize_flow(flow, 4, 4))
    assert out.shape == (1, 4, 4, 2)
    np.testing.assert_allclose(out, 2.0, atol=1e-5)  # 8 px at 16-res = 2 px at 4-res
