"""Invisible watermark round-trip + SafetyChecker decision structure
(legacy `inference.py` capabilities — put_watermark :78, check_safety :97)."""

import numpy as np

from vface_tpu.utils.watermark import (
    DEFAULT_PAYLOAD,
    SafetyChecker,
    embed_watermark,
    extract_watermark,
)


def test_watermark_roundtrip_and_imperceptibility():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (256, 256, 3), np.uint8)
    marked = embed_watermark(img)
    assert extract_watermark(marked) == DEFAULT_PAYLOAD
    # imperceptible: small perturbation, limited to the blue channel
    diff = marked.astype(int) - img.astype(int)
    assert np.abs(diff[..., :2]).max() == 0
    assert np.abs(diff[..., 2]).mean() < 4.0


def test_watermark_custom_payload_and_png_survival(tmp_path):
    from PIL import Image

    img = (np.ones((128, 200, 3)) * 127).astype(np.uint8)
    marked = embed_watermark(img, b"vface")
    p = str(tmp_path / "wm.png")
    Image.fromarray(marked).save(p)
    back = np.asarray(Image.open(p).convert("RGB"))
    assert extract_watermark(back, n_bytes=5) == b"vface"


def test_safety_checker_decision_structure():
    """Cosine-vs-threshold flagging with blackout — concept embeddings set up
    so one image trips a concept and the other does not."""
    import jax

    from vface_tpu.models.clip import CLIPVisionConfig

    cfg = CLIPVisionConfig.tiny()
    checker = SafetyChecker(cfg)
    import jax.numpy as jnp

    clip_params = checker.tower.init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    )["params"]
    imgs = np.stack(
        [
            np.zeros((cfg.image_size, cfg.image_size, 3), np.float32),
            np.ones((cfg.image_size, cfg.image_size, 3), np.float32),
        ]
    )
    # compute the white image's own embedding and use it as the concept →
    # cos = 1 for it, (almost surely) < 1-eps for the black image
    from vface_tpu.models.clip import clip_preprocess

    pooled = checker.tower.apply(
        {"params": clip_params}, clip_preprocess(jnp.asarray(imgs), cfg.image_size)
    )
    proj = np.eye(pooled.shape[-1], 8, dtype=np.float32)
    emb = np.asarray(pooled) @ proj
    params = {
        "clip": clip_params,
        "visual_projection": proj,
        "concept_embeds": emb[1:2],  # the white image's embedding
        "concept_thresholds": np.asarray([0.999]),
        "special_care_embeds": np.zeros((1, 8), np.float32),
        "special_care_thresholds": np.asarray([2.0]),  # never trips
    }
    checked, flagged = checker.check(params, imgs)
    assert bool(flagged[1]) and not bool(flagged[0])
    assert checked[1].max() == 0.0  # flagged image blacked out
    np.testing.assert_array_equal(checked[0], imgs[0])
