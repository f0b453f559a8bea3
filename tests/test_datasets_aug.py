"""Training-aug fidelity tests (reference celebA.py:349-359 + decow :83-96).

The reference augments the masked CLIP reference with albumentations
Resize/HFlip/Rotate(20)/Blur/ElasticTransform and deforms every training mask
with the 3×3-grid TPS 'decow'. These tests pin our numpy re-implementations:
exactness where the op is deterministic (box blur), family/range properties
where it is stochastic (elastic, decow).
"""

import numpy as np

from vface_tpu.data.datasets import (
    CelebATrainDataset,
    _box_blur,
    _elastic_transform,
)


def test_box_blur_matches_naive():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (12, 10, 3)).astype(np.float32)
    for k in (3, 5, 7):
        got = _box_blur(img, k)
        pad = k // 2
        padded = np.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
        want = np.empty_like(img)
        for i in range(img.shape[0]):
            for j in range(img.shape[1]):
                want[i, j] = padded[i : i + k, j : j + k].mean(axis=(0, 1))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_elastic_transform_properties():
    """Range-preserving, finite, and actually deforming (alpha_affine=50 on a
    224² image moves content); identity when both magnitudes are 0."""
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (224, 224, 3)).astype(np.float32)
    out = _elastic_transform(img, np.random.default_rng(2))
    assert out.shape == img.shape and np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert np.abs(out - img).max() > 0.05  # it moved
    ident = _elastic_transform(img, np.random.default_rng(3), alpha=0.0, alpha_affine=0.0)
    np.testing.assert_allclose(ident, img, atol=1e-5)


def test_decow_noise_distribution_matches_reference():
    """Quantitative distribution match of the interior control-point
    displacement vs a torch re-implementation of reference decow
    (celebA.py:88 `(torch.rand([a-2,a-2,2])-0.5)*scale`, scale~U(0.5,1) at
    :475-477): quantiles of the two samples agree, and the support reaches
    past 0.25 — the old two-factor triangular bug capped |disp| at scale/4."""
    import torch

    from vface_tpu.data.datasets import CelebATrainDataset

    ds = CelebATrainDataset.__new__(CelebATrainDataset)
    ds._rng = np.random.default_rng(6)
    n = 4000
    ours = np.concatenate([ds._decow_noise().ravel() for _ in range(n)])

    torch.manual_seed(0)
    ref_rng = np.random.default_rng(7)
    ref = np.concatenate(
        [
            ((torch.rand([1, 1, 2]) - 0.5) * ref_rng.uniform(0.5, 1.0))
            .numpy()
            .ravel()
            for _ in range(n)
        ]
    )
    qs = np.linspace(0.01, 0.99, 99)
    np.testing.assert_allclose(
        np.quantile(ours, qs), np.quantile(ref, qs), atol=0.015
    )
    assert np.abs(ours).max() > 0.3  # single-factor support: up to 0.5
    assert np.abs(ref).max() > 0.3


def test_decow_matches_reference_family():
    """decow: continuous (unthresholded) mask in [0,1]; interior deformation
    bounded by scale/2 at the control point ((U-.5)·scale, scale<=1); edges
    pinned (no displacement at boundary control points)."""
    ds = CelebATrainDataset.__new__(CelebATrainDataset)
    ds._rng = np.random.default_rng(4)
    keep = np.zeros((64, 64, 1), np.float32)
    keep[16:48, 16:48] = 1.0
    moved = False
    for _ in range(4):
        out = ds._decow(keep)
        assert out.shape == keep.shape and np.isfinite(out).all()
        assert out.min() >= -1e-4 and out.max() <= 1.0 + 1e-4
        frac = np.abs(out - keep).mean()
        assert frac < 0.2  # a deformation, not a scramble
        moved = moved or frac > 1e-4
        # continuous values exist on the warped boundary (no binarisation)
        interior = (out > 0.01) & (out < 0.99)
        assert interior.sum() > 0
    assert moved


def test_augment_reference_ranges():
    """Output is 224² in [0,1]; with a fixed rng the flip/rotate/blur branch
    probabilities follow the reference's p=.5/.5/.3/.3 within tolerance."""
    ds = CelebATrainDataset.__new__(CelebATrainDataset)
    ds._rng = np.random.default_rng(5)
    img = np.zeros((64, 64, 3), np.float32)
    img[:, 32:] = 1.0  # vertical edge: flip detectable
    flips = 0
    n = 60
    for _ in range(n):
        out = ds._augment_reference(img)
        assert out.shape == (224, 224, 3)
        assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-6
        if out[112, 20].mean() > 0.5:
            flips += 1
    assert 0.25 < flips / n < 0.75  # HorizontalFlip p=0.5


def test_celeba_mask_combiner(tmp_path):
    """process_celeba_masks merges per-attribute binaries into the index image
    with attr order = class index - 1 and later-attribute overwrite
    (process_CelebA_mask.py semantics)."""
    from PIL import Image

    import sys
    sys.path.insert(0, "scripts")
    from process_celeba_masks import CELEBAHQ_LABEL_LIST, combine_one

    sub = tmp_path / "0"
    sub.mkdir()
    size = 32
    skin = np.zeros((size, size), np.uint8)
    skin[4:28, 4:28] = 255
    nose = np.zeros((size, size), np.uint8)
    nose[12:20, 12:20] = 255  # overlaps skin → must overwrite (nose = 2)
    Image.fromarray(skin).save(sub / "00000_skin.png")
    Image.fromarray(nose).save(sub / "00000_nose.png")
    mask = combine_one(str(tmp_path), 0, size=size)
    assert mask[5, 5] == CELEBAHQ_LABEL_LIST.index("skin") + 1 == 1
    assert mask[15, 15] == CELEBAHQ_LABEL_LIST.index("nose") + 1 == 2
    assert mask[0, 0] == 0  # background
