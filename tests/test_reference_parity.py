"""Random-weight module parity vs the torch reference, THROUGH the converters.

SURVEY §7 hard-part 1 mitigation that is feasible in this environment (no
trained checkpoints exist here, but torch-CPU + transformers do, and the
reference's module files import standalone): instantiate the reference torch
modules with tiny configs, perturb their random weights so every parameter is
non-trivial (the reference zero-inits several output convs), export the
state_dict, run it through `vface_tpu.utils.sd_convert` /
`vface_tpu.utils.torch_convert`, and assert our Flax forward matches the torch
forward to fp32 tolerance.

A failure here means either a converter key-map or a module-semantics drift —
exactly the two ways real-checkpoint loading would silently break.

Reference modules exercised (all under /root/reference/REFace):
  ldm/modules/diffusionmodules/openaimodel.py:528  (UNetModel)
  ldm/modules/diffusionmodules/model.py:216,486    (VAE Encoder/Decoder)
  HF CLIPModel vision tower + ldm/modules/encoders/xf.py:104 (mapper2)
     == FrozenCLIPEmbedder.forward, modules.py:252-261
  src/Face_models/encoders/model_irse.py:9         (ArcFace IR-SE-50)
  pretrained/face_parsing/model.py:236             (BiSeNet)
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference/REFace"


@pytest.fixture(scope="module", autouse=True)
def _reference_importable():
    """Make the reference tree importable with stubs for its absent deps.

    * ``omegaconf`` — openaimodel.py only isinstance-checks ListConfig;
    * ``model_zoo.load_url`` — Resnet18.init_weight downloads ImageNet weights
      (zero egress here); an empty dict keeps the random init.

    (torchvision is stubbed only inside test_bisenet_parity: a global stub
    breaks transformers' find_spec("torchvision") availability probe.)
    """
    sys.dont_write_bytecode = True
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        lc.ListConfig = ListConfig
        om.listconfig = lc
        om.ListConfig = ListConfig
        sys.modules["omegaconf"] = om
        sys.modules["omegaconf.listconfig"] = lc
    import torch.utils.model_zoo as modelzoo

    orig = modelzoo.load_url
    modelzoo.load_url = lambda *a, **k: {}
    yield
    modelzoo.load_url = orig


def perturb_(module: "torch.nn.Module", seed: int = 0, scale: float = 0.05) -> None:
    """Add N(0, scale²) noise to every float parameter AND buffer in place.

    Makes zero-initialised tensors (the reference zero_module output convs)
    non-trivial so a dropped/transposed mapping cannot hide, while keeping
    norm scales ≈1 / BN running_var ≈1 so activations stay well-conditioned.
    """
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for t in list(module.parameters()) + list(module.buffers()):
            if t.is_floating_point():
                t.add_(scale * torch.randn(t.shape, generator=g))


def nchw(x01: np.ndarray) -> "torch.Tensor":
    return torch.from_numpy(np.transpose(x01, (0, 3, 1, 2)).copy())


def to_jax_tree(tree):
    return jax.tree_util.tree_map(jnp.asarray, tree)


def assert_tree_complete(converted, init_tree):
    from vface_tpu.utils.torch_convert import verify_tree

    problems = verify_tree(converted, init_tree)
    assert not problems, f"converter/init tree mismatch: {problems[:10]}"


# ---------------------------------------------------------------------- UNet


def test_unet_eps_parity():
    """Tiny 9-channel UNet: torch forward == our forward on the converted tree."""
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet

    from vface_tpu.models.unet import UNetConfig, UNetModel
    from vface_tpu.utils.sd_convert import convert_sd_unet

    cfg = UNetConfig.tiny()  # mc 32, mult (1,2), nrb 1, heads 4, ctx 64
    tm = TorchUNet(
        image_size=16,
        in_channels=cfg.in_channels,
        out_channels=cfg.out_channels,
        model_channels=cfg.model_channels,
        attention_resolutions=list(cfg.attention_resolutions),
        num_res_blocks=cfg.num_res_blocks,
        channel_mult=list(cfg.channel_mult),
        num_heads=cfg.num_heads,
        use_spatial_transformer=True,
        transformer_depth=cfg.transformer_depth,
        context_dim=cfg.context_dim,
        use_checkpoint=False,
        legacy=False,
    ).eval()
    perturb_(tm, seed=1)
    sd = {f"model.diffusion_model.{k}": v for k, v in tm.state_dict().items()}

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 16, 16, 9)).astype(np.float32)
    t = np.asarray([3, 400], np.int64)
    c = rng.normal(size=(2, 3, cfg.context_dim)).astype(np.float32)

    with torch.no_grad():
        y_t = tm(nchw(x), torch.from_numpy(t), torch.from_numpy(c.copy()))
    y_ref = np.transpose(y_t.numpy(), (0, 2, 3, 1))

    unet = UNetModel(cfg)
    init = unet.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 16, 16, 9)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 3, cfg.context_dim)),
    )["params"]
    params = convert_sd_unet(sd, cfg)
    assert_tree_complete(params, init)

    y_j = unet.apply(
        {"params": to_jax_tree(params)}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(c)
    )
    np.testing.assert_allclose(np.asarray(y_j), y_ref, atol=2e-4, rtol=2e-3)


# ----------------------------------------------------------------------- VAE


def test_vae_parity():
    """Encoder→quant_conv posterior mode and post_quant_conv→Decoder parity."""
    from ldm.modules.diffusionmodules.model import Decoder as TDec, Encoder as TEnc

    from vface_tpu.models.vae import AutoencoderKL, VAEConfig
    from vface_tpu.utils.sd_convert import convert_sd_vae

    cfg = VAEConfig.tiny()  # ch 32, mult (1,2), nrb 1, z 4
    dd = dict(
        ch=cfg.ch,
        out_ch=cfg.out_channels,
        ch_mult=tuple(cfg.ch_mult),
        num_res_blocks=cfg.num_res_blocks,
        attn_resolutions=[],
        dropout=0.0,
        in_channels=cfg.in_channels,
        resolution=32,
        z_channels=cfg.z_channels,
        double_z=cfg.double_z,
    )
    enc = TEnc(**dd).eval()
    dec = TDec(**dd).eval()
    qc = torch.nn.Conv2d(2 * cfg.z_channels, 2 * cfg.embed_dim, 1).eval()
    pqc = torch.nn.Conv2d(cfg.embed_dim, cfg.z_channels, 1).eval()
    for i, m in enumerate((enc, dec, qc, pqc)):
        perturb_(m, seed=10 + i)
    sd = {}
    for prefix, m in (
        ("first_stage_model.encoder", enc),
        ("first_stage_model.decoder", dec),
        ("first_stage_model.quant_conv", qc),
        ("first_stage_model.post_quant_conv", pqc),
    ):
        sd.update({f"{prefix}.{k}": v for k, v in m.state_dict().items()})

    rng = np.random.default_rng(3)
    img = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    z_in = rng.normal(size=(1, 16, 16, cfg.embed_dim)).astype(np.float32)

    with torch.no_grad():
        moments = qc(enc(nchw(img)))
        mode_ref = moments[:, : cfg.embed_dim]
        dec_ref = dec(pqc(nchw(z_in)))

    vae = AutoencoderKL(cfg)
    init = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))["params"]
    params = convert_sd_vae(sd, cfg)
    assert_tree_complete(params, init)
    params = to_jax_tree(params)

    post = vae.apply({"params": params}, jnp.asarray(img), method=AutoencoderKL.encode)
    np.testing.assert_allclose(
        np.asarray(post.mode()),
        np.transpose(mode_ref.numpy(), (0, 2, 3, 1)),
        atol=2e-4,
        rtol=2e-3,
    )
    out = vae.apply({"params": params}, jnp.asarray(z_in), method=AutoencoderKL.decode)
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(dec_ref.numpy(), (0, 2, 3, 1)), atol=2e-4, rtol=2e-3
    )


# ---------------------------------------------------------------------- CLIP


def test_clip_conditioner_parity():
    """HF vision tower → visual_projection → xf mapper2 → final_ln2
    (FrozenCLIPEmbedder.forward, modules.py:252-261) vs CLIPConditioner."""
    transformers = pytest.importorskip("transformers")
    from ldm.modules.encoders.xf import LayerNorm as XfLN, Transformer as XfTransformer

    from vface_tpu.models.clip import CLIPConditioner, CLIPVisionConfig
    from vface_tpu.utils.sd_convert import convert_clip_conditioner

    cfg = CLIPVisionConfig.tiny()  # width 64, layers 2, heads 4, patch 8, img 32
    hf_cfg = transformers.CLIPConfig(
        text_config=dict(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=1,
            num_attention_heads=2,
        ),
        vision_config=dict(
            hidden_size=cfg.width,
            intermediate_size=cfg.width * cfg.mlp_ratio,
            num_hidden_layers=cfg.layers,
            num_attention_heads=cfg.heads,
            image_size=cfg.image_size,
            patch_size=cfg.patch_size,
        ),
        projection_dim=cfg.projection_dim,
    )
    hf = transformers.CLIPModel(hf_cfg).eval()
    mapper2 = XfTransformer(1, cfg.projection_dim, 5, 1).eval()
    final_ln2 = XfLN(cfg.projection_dim).eval()
    perturb_(hf, seed=20, scale=0.02)
    perturb_(mapper2, seed=21, scale=0.02)
    perturb_(final_ln2, seed=22, scale=0.02)

    sd = {f"cond_stage_model.model.{k}": v for k, v in hf.state_dict().items()}
    sd.update({f"cond_stage_model.mapper2.{k}": v for k, v in mapper2.state_dict().items()})
    sd.update({f"cond_stage_model.final_ln2.{k}": v for k, v in final_ln2.state_dict().items()})

    rng = np.random.default_rng(4)
    px = rng.normal(size=(2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)

    with torch.no_grad():
        pooled = hf.vision_model(pixel_values=nchw(px)).pooler_output
        z = hf.visual_projection(pooled)[:, None]
        z_ref = final_ln2(mapper2(z)).numpy()

    ours = CLIPConditioner(cfg)
    init = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, cfg.image_size, cfg.image_size, 3)))[
        "params"
    ]
    params = convert_clip_conditioner(sd, layers=cfg.layers)
    # HF state_dicts carry extra non-vision branches (text tower, logit_scale)
    # the conditioner doesn't use; completeness only requires covering OUR tree.
    from vface_tpu.utils.torch_convert import verify_tree

    problems = [p for p in verify_tree(params, init) if p[1] != "unexpected"]
    assert not problems, f"converter missing/shape problems: {problems[:10]}"

    z_j = ours.apply({"params": to_jax_tree(params)}, jnp.asarray(px))
    np.testing.assert_allclose(np.asarray(z_j), z_ref, atol=2e-4, rtol=2e-3)


# -------------------------------------------------------------------- ArcFace


def test_arcface_parity():
    """IR-SE-50 embedding parity (reference returns [l2_norm(x)],
    model_irse.py:60-69; ours returns the raw 512-d feature)."""
    from src.Face_models.encoders.model_irse import Backbone

    from vface_tpu.models.arcface import IRSE50
    from vface_tpu.utils.torch_convert import convert_arcface

    tm = Backbone(input_size=112, num_layers=50, mode="ir_se").eval()
    perturb_(tm, seed=30, scale=0.02)
    sd = tm.state_dict()

    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, (2, 112, 112, 3)).astype(np.float32)
    with torch.no_grad():
        y_ref = tm(nchw(x))[0].numpy()  # l2-normalised

    ours = IRSE50()
    init = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 112, 112, 3)))["params"]
    params = convert_arcface(sd)
    assert_tree_complete(params, init)
    feats = ours.apply({"params": to_jax_tree(params)}, jnp.asarray(x))
    feats = np.asarray(feats)
    feats = feats / (np.linalg.norm(feats, axis=-1, keepdims=True) + 1e-12)
    np.testing.assert_allclose(feats, y_ref, atol=5e-4, rtol=5e-3)


# -------------------------------------------------------------------- BiSeNet


def test_bisenet_parity():
    """19-class parsing logits parity (pretrained/face_parsing/model.py:236)."""
    import importlib.machinery

    # face_parsing/model.py imports torchvision (unused) and calls .cuda() on
    # two module-level constants (model.py:15-16) — stub both for the import
    if "pretrained.face_parsing.model" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", loader=None)
        sys.modules.setdefault("torchvision", tv)
        orig_cuda = torch.Tensor.cuda
        torch.Tensor.cuda = lambda self, *a, **k: self
        try:
            import pretrained.face_parsing.model  # noqa: F401
        finally:
            torch.Tensor.cuda = orig_cuda
            if sys.modules.get("torchvision") is tv:
                del sys.modules["torchvision"]
    from pretrained.face_parsing.model import BiSeNet as TorchBiSeNet

    from vface_tpu.models.bisenet import BiSeNet
    from vface_tpu.utils.torch_convert import convert_bisenet

    tm = TorchBiSeNet(n_classes=19).eval()
    perturb_(tm, seed=40, scale=0.02)
    sd = tm.state_dict()

    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        y_ref = tm(nchw(x))[0].numpy()  # main head only

    ours = BiSeNet()
    init = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    params = convert_bisenet(sd)
    # the torch model carries two aux training heads (conv_out16/32) we don't
    # keep; completeness only requires covering OUR tree
    from vface_tpu.utils.torch_convert import verify_tree

    problems = [p for p in verify_tree(params, init) if p[1] != "unexpected"]
    assert not problems, f"converter missing/shape problems: {problems[:10]}"
    y_j = ours.apply({"params": to_jax_tree(params)}, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(y_j), np.transpose(y_ref, (0, 2, 3, 1)), atol=5e-4, rtol=5e-3
    )
