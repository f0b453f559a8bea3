"""Alignment geometry, TPS, and mask-semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vface_tpu.preprocess.align import (
    compute_quad,
    paste_back,
    perspective_coefficients,
    perspective_warp,
    quad_crop,
)
from vface_tpu.preprocess.masks import (
    celeba_to_seg12,
    downsample_mask_to_latent,
    inpaint_inputs,
    region_mask,
)
from vface_tpu.preprocess.tps import tps_warp


def _synthetic_landmarks(cx=50.0, cy=50.0, scale=20.0):
    """A plausible frontal 68-pt layout: eyes at ±0.35, mouth at y+0.5."""
    lm = np.zeros((68, 2), np.float32)
    lm[36:42] = [cx - 0.35 * scale, cy]
    lm[42:48] = [cx + 0.35 * scale, cy]
    lm[48] = [cx - 0.25 * scale, cy + 0.5 * scale]
    lm[54] = [cx + 0.25 * scale, cy + 0.5 * scale]
    return lm


def test_compute_quad_geometry():
    lm = jnp.asarray(_synthetic_landmarks())[None]
    quad, qsize = compute_quad(lm)
    quad = np.asarray(quad)[0]
    # quad is a square: all sides equal length
    sides = [np.linalg.norm(quad[(i + 1) % 4] - quad[i]) for i in range(4)]
    np.testing.assert_allclose(sides, sides[0] * np.ones(4), rtol=1e-4)
    # centred near the eye/mouth centroid
    assert abs(quad.mean(axis=0)[0] - 50.0) < 5.0
    # scale param scales the quad
    quad2, _ = compute_quad(lm, scale=2.0)
    s2 = np.linalg.norm(np.asarray(quad2)[0][1] - np.asarray(quad2)[0][0])
    np.testing.assert_allclose(s2, 2 * sides[0], rtol=1e-4)


def test_quad_crop_identity():
    """Cropping with the full-image quad reproduces a smooth image (interior).

    Sampling sits a half pixel off the original grid, so smooth content is the
    right identity probe (random noise would show O(1) neighbor differences).
    """
    size = 32
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    img = jnp.asarray(
        np.stack([xx / size, yy / size, (xx + yy) / (2 * size)], -1).astype(np.float32)
    )[None]
    quad = jnp.asarray(
        [[[0.0, 0.0], [0.0, size - 1], [size - 1, size - 1], [size - 1, 0.0]]]
    )
    out = quad_crop(img, quad, size)
    err = np.abs(np.asarray(out)[0, 2:-2, 2:-2] - np.asarray(img)[0, 2:-2, 2:-2]).max()
    assert err < 0.06  # half-pixel offset on a unit-slope gradient


def test_perspective_identity_coeffs():
    pts = [[0, 0], [0, 10], [10, 10], [10, 0]]
    coeffs = perspective_coefficients(pts, pts)
    np.testing.assert_allclose(coeffs, [1, 0, 0, 0, 1, 0, 0, 0], atol=1e-6)


def test_perspective_warp_translation():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 1)).astype(np.float32))
    # shift sampling by +2 in x: out(x,y) = img(x+2, y)
    coeffs = jnp.asarray([[1, 0, 2, 0, 1, 0, 0, 0]], jnp.float32)
    out = perspective_warp(img, coeffs, 16, 16)
    np.testing.assert_allclose(
        np.asarray(out)[0, :, :-2], np.asarray(img)[0, :, 2:], atol=1e-5
    )


def test_paste_back_composites():
    frame = jnp.zeros((1, 16, 16, 3))
    crop = jnp.ones((1, 8, 8, 3))
    # identity mapping into the top-left 8x8 region
    coeffs = jnp.asarray([[1, 0, 0, 0, 1, 0, 0, 0]], jnp.float32)
    out = np.asarray(paste_back(frame, crop, coeffs))
    assert out[0, 2, 2, 0] == 1.0  # inside the crop region
    assert out[0, 14, 14, 0] == 0.0  # outside stays background


def test_tps_identity():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 2)).astype(np.float32))
    pts = jnp.asarray(rng.uniform(-0.8, 0.8, (1, 5, 2)).astype(np.float32))
    out = tps_warp(img, pts, pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)


def test_mask_tables():
    mask = jnp.asarray([[0, 1, 17], [10, 14, 18]], jnp.int32)[None]
    face = region_mask(mask, (1, 10, 17))
    np.testing.assert_array_equal(
        np.asarray(face)[0], [[0, 1, 1], [1, 0, 0]]
    )
    seg12 = np.asarray(celeba_to_seg12(mask))[0]
    assert seg12[0, 0] == 0 and seg12[0, 1] == 10 and seg12[0, 2] == 1
    img = jnp.ones((1, 2, 3, 3))
    inp, keep = inpaint_inputs(img, mask, (1, 10, 17))
    np.testing.assert_array_equal(np.asarray(keep)[0, :, :, 0], [[1, 0, 0], [0, 1, 1]])
    np.testing.assert_allclose(np.asarray(inp), np.asarray(img * keep))


def test_downsample_mask():
    m = jnp.ones((1, 8, 8, 1))
    out = downsample_mask_to_latent(m, 4)
    assert out.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(np.asarray(out), 1.0)
