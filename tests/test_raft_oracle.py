"""RAFT building-block oracles (paper equations / torchvision semantics).

torchvision is not installed in this environment, so the trained-weight flow
check is not runnable here; these tests pin the pieces that the converter-
loaded weights will flow through, against hand-computed references:

* all-pairs correlation volume layout + 1/sqrt(C) normalisation
  (RAFT §3.2; torchvision CorrBlock.corr),
* pyramid lookup window ordering, border clamp, and per-level coordinate
  scaling (torchvision CorrBlock.__call__ with align_corners=True sampling),
* convex upsampling's 3×3-neighbour / 8×8-subpixel arrangement
  (RAFT §3.3; torchvision upsample_flow's unfold+permute order).

A shift-consistency property test verifies the correlation volume actually
encodes displacement (argmax at the true shift), which is the contract the
flow_fix fusion depends on.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vface_tpu.models.raft import (
    convex_upsample,
    correlation_pyramid,
    lookup_corr,
)


def test_correlation_volume_layout_and_norm():
    """corr[b,i,j,k,l] = <f1[b,i,j], f2[b,k,l]> / sqrt(C)."""
    rng = np.random.default_rng(0)
    b, h, w, c = 2, 4, 5, 8
    f1 = rng.normal(size=(b, h, w, c)).astype(np.float32)
    f2 = rng.normal(size=(b, h, w, c)).astype(np.float32)
    corr = np.asarray(correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), levels=1)[0])
    want = np.einsum("bijc,bklc->bijkl", f1, f2) / np.sqrt(c)
    np.testing.assert_allclose(corr, want, atol=1e-5)


def test_correlation_argmax_finds_shift():
    """f2 = f1 rolled by (dy, dx) → for interior pixels the best match of
    f1[i, j] is f2[i+dy, j+dx] — the displacement signal RAFT iterates on."""
    rng = np.random.default_rng(1)
    h, w, c = 12, 12, 32
    f1 = rng.normal(size=(1, h, w, c)).astype(np.float32)
    dy, dx = 2, 3
    f2 = np.roll(f1, (dy, dx), axis=(1, 2))
    corr = np.asarray(correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), levels=1)[0])
    for i in range(3, 8):
        for j in range(3, 8):
            k, l = np.unravel_index(np.argmax(corr[0, i, j]), (h, w))
            assert (k, l) == (i + dy, j + dx)


def test_pyramid_levels_average_pool():
    """Level l is 2× avg-pooled over the *second* (k, l) pair of axes."""
    rng = np.random.default_rng(2)
    f1 = rng.normal(size=(1, 4, 4, 8)).astype(np.float32)
    f2 = rng.normal(size=(1, 4, 4, 8)).astype(np.float32)
    pyr = correlation_pyramid(jnp.asarray(f1), jnp.asarray(f2), levels=2)
    lvl0, lvl1 = np.asarray(pyr[0]), np.asarray(pyr[1])
    assert lvl1.shape == (1, 4, 4, 2, 2)
    want = lvl0.reshape(1, 4, 4, 2, 2, 2, 2).mean(axis=(4, 6))
    np.testing.assert_allclose(lvl1, want, atol=1e-5)


def test_lookup_corr_window_order_and_clamp():
    """Radius-r lookup at integer coords returns the (2r+1)² window in
    row-major (dy outer, dx inner) order with ZERO padding — the ordering and
    padding the torchvision-trained motion-encoder weights expect (delta
    meshgrid with dy first; CorrBlock's grid_sample never sets padding_mode,
    so out-of-range taps read zero, not the border texel)."""
    h = w = 6
    # corr value encodes its own (k, l) position: v = k*100 + l
    kk, ll = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    vol = np.broadcast_to((kk * 100 + ll).astype(np.float32), (1, h, w, h, w))
    pyramid = [jnp.asarray(vol)]
    coords = np.zeros((1, h, w, 2), np.float32)
    coords[..., 0] = 3.0  # x
    coords[..., 1] = 2.0  # y
    out = np.asarray(lookup_corr(pyramid, jnp.asarray(coords), radius=1))
    assert out.shape == (1, h, w, 9)
    # window centred at (y=2, x=3): rows 1..3 × cols 2..4, row-major
    want = np.asarray(
        [102, 103, 104, 202, 203, 204, 302, 303, 304], np.float32
    )
    np.testing.assert_allclose(out[0, 0, 0], want, atol=1e-4)
    # zero padding: centre at (0, 0) — the out-of-range row/col read zero
    coords0 = np.zeros((1, h, w, 2), np.float32)
    out0 = np.asarray(lookup_corr(pyramid, jnp.asarray(coords0), radius=1))
    want0 = np.asarray([0, 0, 0, 0, 0, 1, 0, 100, 101], np.float32)
    np.testing.assert_allclose(out0[0, 0, 0], want0, atol=1e-4)
    # fractional out-of-range centre: corners outside contribute zero
    # (grid_sample zeros semantics), so value = 0.5 * corr[0, 0]
    coordsf = np.zeros((1, h, w, 2), np.float32)
    coordsf[..., 1] = -0.5  # y = -0.5, x = 0
    outf = np.asarray(lookup_corr(pyramid, jnp.asarray(coordsf), radius=0))
    np.testing.assert_allclose(outf[0, 0, 0], [0.5 * vol[0, 0, 0, 0, 0]], atol=1e-4)


def test_lookup_corr_level_scaling():
    """Level-l centroids are coords / 2^l (torchvision: centroid_lvl =
    coords / 2**i)."""
    h = w = 4
    lvl1 = np.zeros((1, h, w, 2, 2), np.float32)
    lvl1[..., 1, 1] = 7.0  # mark position (1, 1) at level 1
    pyramid = [jnp.asarray(np.zeros((1, h, w, h, w), np.float32)), jnp.asarray(lvl1)]
    coords = np.full((1, h, w, 2), 2.0, np.float32)  # level-0 (2,2) → level-1 (1,1)
    out = np.asarray(lookup_corr(pyramid, jnp.asarray(coords), radius=0))
    assert out.shape == (1, h, w, 2)
    np.testing.assert_allclose(out[0, 0, 0], [0.0, 7.0], atol=1e-5)


def test_convex_upsample_onehot_neighbors():
    """A mask concentrated on one 3×3 neighbour makes every 8×8 subpixel
    block equal 8× that neighbour's coarse flow (RAFT §3.3). Neighbour k is
    row-major over (dy, dx) ∈ {-1,0,1}² — torch F.unfold order."""
    b, h, w = 1, 3, 3
    flow = np.arange(b * h * w * 2, dtype=np.float32).reshape(b, h, w, 2)
    for k, (di, dj) in enumerate([(i, j) for i in range(3) for j in range(3)]):
        logits = np.full((b, h, w, 9, 8, 8), -1e4, np.float32)
        logits[:, :, :, k] = 1e4
        mask = logits.reshape(b, h, w, 9 * 8 * 8)
        up = np.asarray(convex_upsample(jnp.asarray(flow), jnp.asarray(mask)))
        assert up.shape == (b, 8 * h, 8 * w, 2)
        # centre coarse cell (1,1): its 8×8 block must be 8*flow[neighbour]
        ni, nj = 1 + di - 1, 1 + dj - 1
        block = up[0, 8:16, 8:16]
        np.testing.assert_allclose(
            block, np.broadcast_to(8.0 * flow[0, ni, nj], (8, 8, 2)), atol=1e-3
        )


def test_raft_forward_shapes_and_finite(tiny_raft_params=None):
    """End-to-end forward: correct shape/dtype, finite, and batched pairs
    (the window-batched FGATS call) work."""
    import jax

    from vface_tpu.models.raft import RAFT, RAFTConfig

    net = RAFT(RAFTConfig(iters=2))
    x1 = jnp.asarray(np.random.default_rng(3).normal(size=(2, 32, 32, 3)), jnp.float32)
    x2 = jnp.asarray(np.random.default_rng(4).normal(size=(2, 32, 32, 3)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x1, x2)["params"]
    flow = net.apply({"params": params}, x1, x2)
    assert flow.shape == (2, 32, 32, 2)
    assert bool(jnp.isfinite(flow).all())
