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


def test_safety_checker_converter_parity():
    """convert_safety_checker: HF StableDiffusionSafetyChecker state_dict →
    SafetyChecker params, with flag parity against a torch re-computation of
    the diffusers decision rule (cosine vs thresholds, 0.01 special-care
    adjustment) — reference loads this checker in `scripts/inference.py:88-101`."""
    import pytest

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import jax

    from vface_tpu.models.clip import CLIPVisionConfig
    from vface_tpu.utils.sd_convert import convert_safety_checker

    cfg = CLIPVisionConfig.tiny()
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=cfg.width,
        intermediate_size=cfg.width * cfg.mlp_ratio,
        num_hidden_layers=cfg.layers,
        num_attention_heads=cfg.heads,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
    )
    hf = transformers.CLIPVisionModel(hf_cfg).eval()
    torch.manual_seed(7)
    with torch.no_grad():
        for p in hf.parameters():
            p.add_(0.02 * torch.randn_like(p))
    n_concepts, n_special, pdim = 4, 2, cfg.projection_dim
    proj_w = torch.randn(pdim, cfg.width) * 0.05

    rng = np.random.default_rng(11)
    imgs = rng.uniform(size=(2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)

    # torch oracle: CLIP-normalise, embed, project
    from vface_tpu.models.clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    px = (imgs - np.asarray(CLIP_IMAGE_MEAN, np.float32)) / np.asarray(CLIP_IMAGE_STD, np.float32)
    with torch.no_grad():
        pooled = hf(pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2))).pooler_output
        emb = pooled @ proj_w.T

    # concept/special embed 0 = image0's embedding orthogonalised against
    # image1's, so image1's cosine with it is exactly 0 — robust margins
    e0, e1 = emb[0], emb[1]
    c0 = e0 - (e0 @ e1 / (e1 @ e1)) * e1
    m = float((e0 / e0.norm()) @ (c0 / c0.norm()))
    assert m > 0.1, "degenerate collinear embeddings; reseed the test"
    concept_embeds = torch.randn(n_concepts, pdim)
    special_embeds = torch.randn(n_special, pdim)
    concept_embeds[0] = c0
    special_embeds[0] = c0

    def cos(a, b):
        an = a / a.norm(dim=-1, keepdim=True)
        bn = b / b.norm(dim=-1, keepdim=True)
        return (an @ bn.T).numpy()

    with torch.no_grad():
        c_cos = cos(emb, concept_embeds)  # (2, C)
        s_cos = cos(emb, special_embeds)  # (2, S)

    # image0 trips special care 0 (margin 0.05) and concept 0 only via the
    # +0.01 strict adjustment (margin −0.005); image1 trips nothing (its
    # cosine with bank slot 0 is 0; other slots get thresholds ≥ max + 0.05)
    special_thr = np.asarray([m - 0.05, s_cos[:, 1].max() + 0.05], np.float32)
    concept_thr = (c_cos.max(axis=0) + 0.05).astype(np.float32)
    concept_thr[0] = m + 0.005
    expected_flags = np.asarray([True, False])

    # diffusers rule re-computed in torch (safety_checker.py forward)
    strict = (s_cos - special_thr > 0).any(axis=-1, keepdims=True) * 0.01
    torch_flags = ((c_cos - concept_thr + strict) > 0).any(axis=-1)
    np.testing.assert_array_equal(torch_flags, expected_flags)

    sd = {f"vision_model.{k}": v for k, v in hf.state_dict().items()}
    sd["visual_projection.weight"] = proj_w
    sd["concept_embeds"] = concept_embeds
    sd["concept_embeds_weights"] = torch.from_numpy(concept_thr)
    sd["special_care_embeds"] = special_embeds
    sd["special_care_embeds_weights"] = torch.from_numpy(special_thr)
    params = convert_safety_checker(sd)

    checker = SafetyChecker(cfg)
    # converter must cover the full tower tree
    init = checker.tower.init(
        jax.random.PRNGKey(0),
        np.zeros((1, cfg.image_size, cfg.image_size, 3), np.float32),
    )["params"]
    from vface_tpu.utils.torch_convert import verify_tree

    problems = [p for p in verify_tree({"clip": params["clip"]}, {"clip": init}) if p[1] != "unexpected"]
    assert not problems, f"converter problems: {problems[:10]}"

    checked, flagged = checker.check(params, imgs)
    np.testing.assert_array_equal(np.asarray(flagged), torch_flags)
    assert checked[0].max() == 0.0 and np.array_equal(checked[1], imgs[1])
