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


# ----------------------------------------------------------------- eval nets
#
# The eval harness nets (SURVEY §2.8). Hopenet and Deep3DFaceRecon's net_recon
# are pure-torch in the reference and import standalone; LPIPS/FID-Inception
# reference files import torchvision (absent), so their torch oracles are
# built in-test with the exact torchvision module naming the checkpoints use.


def _load_ref_module(name, path):
    import importlib.util

    # networks.py imports kornia.geometry.warp_affine (absent here; unused by
    # the net_recon path) — stub it
    if "kornia" not in sys.modules:
        k = types.ModuleType("kornia")
        kg = types.ModuleType("kornia.geometry")
        kg.warp_affine = lambda *a, **kw: (_ for _ in ()).throw(RuntimeError("stub"))
        k.geometry = kg
        sys.modules["kornia"] = k
        sys.modules["kornia.geometry"] = kg
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{path}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _TorchBottleneck(torch.nn.Module):
    """torchvision v1.5 Bottleneck (stride on conv2) with torchvision naming —
    pose_compare.py:304 passes ``models.resnet.Bottleneck``."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        nn = torch.nn
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return self.relu(h + idt)


def test_hopenet_parity():
    """Hopenet (eval_tool/face_vid2vid/modules/hopenet.py:7) yaw/pitch/roll
    logits == ours on the converted tree."""
    hopenet_mod = _load_ref_module("ref_hopenet", "eval_tool/face_vid2vid/modules/hopenet.py")

    from vface_tpu.eval.pose import Hopenet
    from vface_tpu.utils.torch_convert import convert_hopenet, verify_tree

    torch.manual_seed(500)  # deterministic oracle init
    tm = hopenet_mod.Hopenet(_TorchBottleneck, [3, 4, 6, 3], 66).eval()
    perturb_(tm, seed=50, scale=0.02)
    sd = tm.state_dict()

    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 224, 224, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        yaw_ref, pitch_ref, roll_ref = tm(nchw(x))

    ours = Hopenet()
    init = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))["params"]
    params = convert_hopenet(sd)
    assert_tree_complete(params, init)
    yaw, pitch, roll = ours.apply({"params": to_jax_tree(params)}, jnp.asarray(x))
    for a, b in ((yaw, yaw_ref), (pitch, pitch_ref), (roll, roll_ref)):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=5e-4, rtol=5e-3)


def test_face_recon_parity():
    """Deep3DFaceRecon net_recon (networks.py:69-104, use_last_fc=False):
    257-coeff output == ours; the 7 conv1x1 heads concatenate into Dense(257)."""
    networks = _load_ref_module(
        "ref_d3d_networks", "eval_tool/Deep3DFaceRecon_pytorch_edit/models/networks.py"
    )

    from vface_tpu.eval.expression import FaceReconNet
    from vface_tpu.utils.torch_convert import convert_face_recon

    torch.manual_seed(510)  # deterministic oracle init
    tm = networks.ReconNetWrapper("resnet50", use_last_fc=False).eval()
    perturb_(tm, seed=51, scale=0.02)
    sd = tm.state_dict()

    rng = np.random.default_rng(8)
    x = rng.normal(size=(1, 224, 224, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        y_ref = tm(nchw(x)).numpy()

    ours = FaceReconNet()
    init = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))["params"]
    params = convert_face_recon(sd)
    assert_tree_complete(params, init)
    y = ours.apply({"params": to_jax_tree(params)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=5e-4, rtol=5e-3)


def _torch_lpips_oracle():
    """Reference LPIPS (eval_tool/lpips/lpips.py + networks.py AlexNet) with
    checkpoint-identical key names (net.layers.N / lin.N.1)."""
    nn = torch.nn

    class _AlexBase(nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = nn.Sequential(
                nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
                nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
                nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(),
                nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(),
                nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(), nn.MaxPool2d(3, 2),
            )
            self.register_buffer("mean", torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None])
            self.register_buffer("std", torch.tensor([0.458, 0.448, 0.450])[None, :, None, None])
            self.target_layers = [2, 5, 8, 10, 12]

        def forward(self, x):
            x = (x - self.mean) / self.std
            out = []
            for i, layer in enumerate(self.layers, 1):
                x = layer(x)
                if i in self.target_layers:
                    nf = torch.sqrt(torch.sum(x**2, dim=1, keepdim=True) + 1e-16)
                    out.append(x / (nf + 1e-10))
            return out

    class _LPIPS(nn.Module):
        def __init__(self):
            super().__init__()
            self.net = _AlexBase()
            self.lin = nn.ModuleList(
                nn.Sequential(nn.Identity(), nn.Conv2d(nc, 1, 1, bias=False))
                for nc in (64, 192, 384, 256, 256)
            )

        def forward(self, x, y):
            fx, fy = self.net(x), self.net(y)
            res = [l(  (a - b) ** 2  ).mean((2, 3), True) for a, b, l in zip(fx, fy, self.lin)]
            return torch.sum(torch.cat(res, 0)) / x.shape[0]

    return _LPIPS()


def test_lpips_parity():
    """LPIPS distance (lpips.py:55-60 forward) == ours on converted weights."""
    from vface_tpu.eval.lpips import LPIPS
    from vface_tpu.utils.torch_convert import convert_lpips

    torch.manual_seed(520)  # oracle init draws from the global RNG
    tm = _torch_lpips_oracle().eval()
    perturb_(tm, seed=52, scale=0.05)
    with torch.no_grad():
        # the z-score buffers are LPIPS spec constants (networks.py:41-44),
        # hardcoded on our side exactly as in the reference — un-perturb them
        tm.net.mean.copy_(torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None])
        tm.net.std.copy_(torch.tensor([0.458, 0.448, 0.450])[None, :, None, None])
    sd = tm.state_dict()

    rng = np.random.default_rng(9)
    a = (rng.uniform(-1, 1, size=(2, 64, 64, 3))).astype(np.float32)
    b = (rng.uniform(-1, 1, size=(2, 64, 64, 3))).astype(np.float32)
    with torch.no_grad():
        d_ref = float(tm(nchw(a), nchw(b)))

    ours = LPIPS()
    init = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))["params"]
    params = convert_lpips(sd)
    assert_tree_complete(params, init)
    d = ours.apply({"params": to_jax_tree(params)}, jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(float(np.mean(np.asarray(d))), d_ref, atol=1e-4, rtol=1e-3)


def _torch_fid_inception():
    """pytorch-fid InceptionV3 (eval_tool/fid/inception.py: torchvision blocks
    with the FID pool-branch overrides) with checkpoint-identical naming."""
    nn = torch.nn
    F = torch.nn.functional

    class BC(nn.Module):
        def __init__(self, i, o, **kw):
            super().__init__()
            self.conv = nn.Conv2d(i, o, bias=False, **kw)
            self.bn = nn.BatchNorm2d(o, eps=0.001)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    def fid_avg(x):  # FIDInceptionA/C/E_1 pool branch (inception.py:225,253,286)
        return F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)

    class IncA(nn.Module):
        def __init__(self, i, pool):
            super().__init__()
            self.branch1x1 = BC(i, 64, kernel_size=1)
            self.branch5x5_1 = BC(i, 48, kernel_size=1)
            self.branch5x5_2 = BC(48, 64, kernel_size=5, padding=2)
            self.branch3x3dbl_1 = BC(i, 64, kernel_size=1)
            self.branch3x3dbl_2 = BC(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BC(96, 96, kernel_size=3, padding=1)
            self.branch_pool = BC(i, pool, kernel_size=1)

        def forward(self, x):
            return torch.cat([
                self.branch1x1(x),
                self.branch5x5_2(self.branch5x5_1(x)),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                self.branch_pool(fid_avg(x)),
            ], 1)

    class IncB(nn.Module):
        def __init__(self, i):
            super().__init__()
            self.branch3x3 = BC(i, 384, kernel_size=3, stride=2)
            self.branch3x3dbl_1 = BC(i, 64, kernel_size=1)
            self.branch3x3dbl_2 = BC(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BC(96, 96, kernel_size=3, stride=2)

        def forward(self, x):
            return torch.cat([
                self.branch3x3(x),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                F.max_pool2d(x, 3, 2),
            ], 1)

    class IncC(nn.Module):
        def __init__(self, i, c7):
            super().__init__()
            self.branch1x1 = BC(i, 192, kernel_size=1)
            self.branch7x7_1 = BC(i, c7, kernel_size=1)
            self.branch7x7_2 = BC(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7_3 = BC(c7, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_1 = BC(i, c7, kernel_size=1)
            self.branch7x7dbl_2 = BC(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_3 = BC(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7dbl_4 = BC(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_5 = BC(c7, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch_pool = BC(i, 192, kernel_size=1)

        def forward(self, x):
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
                self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
            return torch.cat([self.branch1x1(x), b7, bd, self.branch_pool(fid_avg(x))], 1)

    class IncD(nn.Module):
        def __init__(self, i):
            super().__init__()
            self.branch3x3_1 = BC(i, 192, kernel_size=1)
            self.branch3x3_2 = BC(192, 320, kernel_size=3, stride=2)
            self.branch7x7x3_1 = BC(i, 192, kernel_size=1)
            self.branch7x7x3_2 = BC(192, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7x3_3 = BC(192, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7x3_4 = BC(192, 192, kernel_size=3, stride=2)

        def forward(self, x):
            b3 = self.branch3x3_2(self.branch3x3_1(x))
            b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x))))
            return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)

    class IncE(nn.Module):
        def __init__(self, i, max_pool_branch):
            super().__init__()
            self.max_pool_branch = max_pool_branch
            self.branch1x1 = BC(i, 320, kernel_size=1)
            self.branch3x3_1 = BC(i, 384, kernel_size=1)
            self.branch3x3_2a = BC(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3_2b = BC(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch3x3dbl_1 = BC(i, 448, kernel_size=1)
            self.branch3x3dbl_2 = BC(448, 384, kernel_size=3, padding=1)
            self.branch3x3dbl_3a = BC(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3dbl_3b = BC(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch_pool = BC(i, 192, kernel_size=1)

        def forward(self, x):
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
            # FIDInceptionE_2 (Mixed_7c) uses max pooling (inception.py:321)
            bp = F.max_pool2d(x, 3, 1, 1) if self.max_pool_branch else fid_avg(x)
            return torch.cat([self.branch1x1(x), b3, bd, self.branch_pool(bp)], 1)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BC(3, 32, kernel_size=3, stride=2)
            self.Conv2d_2a_3x3 = BC(32, 32, kernel_size=3)
            self.Conv2d_2b_3x3 = BC(32, 64, kernel_size=3, padding=1)
            self.Conv2d_3b_1x1 = BC(64, 80, kernel_size=1)
            self.Conv2d_4a_3x3 = BC(80, 192, kernel_size=3)
            self.Mixed_5b = IncA(192, 32)
            self.Mixed_5c = IncA(256, 64)
            self.Mixed_5d = IncA(288, 64)
            self.Mixed_6a = IncB(288)
            self.Mixed_6b = IncC(768, 128)
            self.Mixed_6c = IncC(768, 160)
            self.Mixed_6d = IncC(768, 160)
            self.Mixed_6e = IncC(768, 192)
            self.Mixed_7a = IncD(768)
            self.Mixed_7b = IncE(1280, False)
            self.Mixed_7c = IncE(2048, True)

        def forward(self, x):
            h = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
            h = F.max_pool2d(h, 3, 2)
            h = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(h))
            h = F.max_pool2d(h, 3, 2)
            for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                         "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
                         "Mixed_7c"):
                h = getattr(self, name)(h)
            return F.adaptive_avg_pool2d(h, (1, 1)).flatten(1)

    return Net()


def test_fid_inception_parity():
    """FID InceptionV3 pool3 features == ours on the converted tree (incl. the
    Mixed_7c max-pool branch of FIDInceptionE_2)."""
    from vface_tpu.eval.fid import InceptionV3Pool3
    from vface_tpu.utils.torch_convert import convert_fid_inception

    torch.manual_seed(530)  # deterministic oracle init
    tm = _torch_fid_inception().eval()
    perturb_(tm, seed=53, scale=0.02)
    sd = tm.state_dict()

    rng = np.random.default_rng(10)
    x = rng.uniform(-1, 1, size=(1, 95, 95, 3)).astype(np.float32)
    with torch.no_grad():
        y_ref = tm(nchw(x)).numpy()

    ours = InceptionV3Pool3()
    init = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 95, 95, 3)))["params"]
    params = convert_fid_inception(sd)
    assert_tree_complete(params, init)
    y = ours.apply({"params": to_jax_tree(params)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-3, rtol=5e-3)


# ----------------------------------------------------------------- RAFT


def _torch_raft_oracle():
    """torchvision ``raft_large`` replica (the reference's flow net,
    temporal_flow.py:27-28) with checkpoint-identical key names; forward
    follows the semantics already pinned in tests/test_raft_oracle.py."""
    nn = torch.nn
    F = torch.nn.functional

    def norm_mod(kind, ch):
        return nn.InstanceNorm2d(ch) if kind == "instance" else nn.BatchNorm2d(ch)

    def cna(i, o, ks, stride, pad, norm):
        mods = [nn.Conv2d(i, o, ks, stride, pad, bias=norm is None)]
        if norm is not None:
            mods.append(norm_mod(norm, o))
        mods.append(nn.ReLU())
        return nn.Sequential(*mods)

    class RB(nn.Module):
        def __init__(self, i, o, stride, norm):
            super().__init__()
            self.convnormrelu1 = cna(i, o, 3, stride, 1, norm)
            self.convnormrelu2 = cna(o, o, 3, 1, 1, norm)
            if stride == 1:
                self.downsample = nn.Identity()
            else:
                self.downsample = nn.Sequential(
                    nn.Conv2d(i, o, 1, stride, bias=False), norm_mod(norm, o)
                )

        def forward(self, x):
            y = self.convnormrelu2(self.convnormrelu1(x))
            return F.relu(self.downsample(x) + y)

    class Enc(nn.Module):
        def __init__(self, norm):
            super().__init__()
            self.convnormrelu = cna(3, 64, 7, 2, 3, norm)
            self.layer1 = nn.Sequential(RB(64, 64, 1, norm), RB(64, 64, 1, norm))
            self.layer2 = nn.Sequential(RB(64, 96, 2, norm), RB(96, 96, 1, norm))
            self.layer3 = nn.Sequential(RB(96, 128, 2, norm), RB(128, 128, 1, norm))
            self.conv = nn.Conv2d(128, 256, 1)

        def forward(self, x):
            return self.conv(self.layer3(self.layer2(self.layer1(self.convnormrelu(x)))))

    class ME(nn.Module):
        def __init__(self):
            super().__init__()
            self.convcorr1 = nn.Sequential(nn.Conv2d(324, 256, 1), nn.ReLU())
            self.convcorr2 = nn.Sequential(nn.Conv2d(256, 192, 3, 1, 1), nn.ReLU())
            self.convflow1 = nn.Sequential(nn.Conv2d(2, 128, 7, 1, 3), nn.ReLU())
            self.convflow2 = nn.Sequential(nn.Conv2d(128, 64, 3, 1, 1), nn.ReLU())
            self.conv = nn.Sequential(nn.Conv2d(256, 126, 3, 1, 1), nn.ReLU())

        def forward(self, flow, corr):
            cf = self.convcorr2(self.convcorr1(corr))
            ff = self.convflow2(self.convflow1(flow))
            h = self.conv(torch.cat([cf, ff], 1))
            return torch.cat([h, flow], 1)

    class GRU(nn.Module):
        def __init__(self, ks, pad):
            super().__init__()
            self.convz = nn.Conv2d(384, 128, ks, padding=pad)
            self.convr = nn.Conv2d(384, 128, ks, padding=pad)
            self.convq = nn.Conv2d(384, 128, ks, padding=pad)

        def forward(self, h, x):
            hx = torch.cat([h, x], 1)
            z = torch.sigmoid(self.convz(hx))
            r = torch.sigmoid(self.convr(hx))
            q = torch.tanh(self.convq(torch.cat([r * h, x], 1)))
            return (1 - z) * h + z * q

    class Recurrent(nn.Module):
        def __init__(self):
            super().__init__()
            self.convgru1 = GRU((1, 5), (0, 2))
            self.convgru2 = GRU((5, 1), (2, 0))

        def forward(self, h, x):
            return self.convgru2(self.convgru1(h, x), x)

    class FlowHead(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(128, 256, 3, 1, 1)
            self.conv2 = nn.Conv2d(256, 2, 3, 1, 1)

        def forward(self, x):
            return self.conv2(F.relu(self.conv1(x)))

    class Update(nn.Module):
        def __init__(self):
            super().__init__()
            self.motion_encoder = ME()
            self.recurrent_block = Recurrent()
            self.flow_head = FlowHead()

    class MaskPred(nn.Module):
        def __init__(self):
            super().__init__()
            self.convrelu = nn.Sequential(nn.Conv2d(128, 256, 3, 1, 1), nn.ReLU())
            self.conv = nn.Conv2d(256, 576, 1)

        def forward(self, x):
            return 0.25 * self.conv(self.convrelu(x))

    def bilerp(img, x, y):
        """img (N, H, W); x/y (N, K) pixel coords; ZERO padding (grid_sample
        default — torchvision's CorrBlock never sets padding_mode)."""
        n, hh, ww = img.shape
        x0, y0 = x.floor(), y.floor()
        wx, wy = x - x0, y - y0

        def g(yi, xi):
            valid = ((yi >= 0) & (yi <= hh - 1) & (xi >= 0) & (xi <= ww - 1)).float()
            yi = yi.clamp(0, hh - 1).long()
            xi = xi.clamp(0, ww - 1).long()
            return img.reshape(n, -1).gather(1, yi * ww + xi) * valid

        top = g(y0, x0) * (1 - wx) + g(y0, x0 + 1) * wx
        bot = g(y0 + 1, x0) * (1 - wx) + g(y0 + 1, x0 + 1) * wx
        return top * (1 - wy) + bot * wy

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.feature_encoder = Enc("instance")
            self.context_encoder = Enc("batch")
            self.update_block = Update()
            self.mask_predictor = MaskPred()

        def forward(self, img1, img2, iters):
            b = img1.shape[0]
            f = self.feature_encoder(torch.cat([img1, img2], 0))
            f1, f2 = f[:b], f[b:]
            _, c, h, w = f1.shape
            corr = torch.einsum("bchw,bcij->bhwij", f1, f2) / c**0.5
            pyr = [corr.reshape(b * h * w, 1, h, w)]
            for _ in range(3):
                pyr.append(F.avg_pool2d(pyr[-1], 2, 2))
            cnet = self.context_encoder(img1)
            hidden, ctx = torch.tanh(cnet[:, :128]), F.relu(cnet[:, 128:])
            ys, xs = torch.meshgrid(
                torch.arange(h, dtype=torch.float32),
                torch.arange(w, dtype=torch.float32), indexing="ij",
            )
            d = torch.arange(-4, 5, dtype=torch.float32)
            dyy, dxx = torch.meshgrid(d, d, indexing="ij")
            offx, offy = dxx.reshape(-1), dyy.reshape(-1)  # dy-major window

            flow = torch.zeros(b, 2, h, w)
            for _ in range(iters):
                cx = xs[None] + flow[:, 0]
                cy = ys[None] + flow[:, 1]
                feats = []
                for lvl, cvol in enumerate(pyr):
                    img = cvol[:, 0]
                    px = cx.reshape(-1, 1) / 2**lvl + offx[None]
                    py = cy.reshape(-1, 1) / 2**lvl + offy[None]
                    s = bilerp(img, px, py)
                    feats.append(s.reshape(b, h, w, -1).permute(0, 3, 1, 2))
                corr_feat = torch.cat(feats, 1)
                m = self.update_block.motion_encoder(flow, corr_feat)
                hidden = self.update_block.recurrent_block(hidden, torch.cat([ctx, m], 1))
                delta = self.update_block.flow_head(hidden)
                flow = flow + delta
            mask = self.mask_predictor(hidden)
            mask = mask.view(b, 1, 9, 8, 8, h, w).softmax(2)
            up = F.unfold(8 * flow, (3, 3), padding=1).view(b, 2, 9, 1, 1, h, w)
            up = (mask * up).sum(2)
            return up.permute(0, 1, 4, 2, 5, 3).reshape(b, 2, 8 * h, 8 * w)

    return Net()


def test_raft_parity():
    """Full RAFT forward (2 iters, 64²): torch oracle == ours through
    convert_raft — validates the torchvision name map, the affine-less
    instance-norm / bias-less conv fills, and every block's semantics."""
    from vface_tpu.models.raft import RAFT, RAFTConfig
    from vface_tpu.utils.torch_convert import convert_raft

    torch.manual_seed(540)  # deterministic oracle init
    tm = _torch_raft_oracle().eval()
    perturb_(tm, seed=54, scale=0.02)
    sd = tm.state_dict()

    rng = np.random.default_rng(11)
    i1 = rng.uniform(-1, 1, size=(1, 64, 64, 3)).astype(np.float32)
    i2 = np.clip(i1 + rng.normal(scale=0.05, size=i1.shape).astype(np.float32), -1, 1)
    with torch.no_grad():
        y_ref = tm(nchw(i1), nchw(i2), iters=2).numpy()

    ours = RAFT(RAFTConfig(iters=2))
    init = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))["params"]
    params = convert_raft(sd)
    assert_tree_complete(params, init)
    y = ours.apply({"params": to_jax_tree(params)}, jnp.asarray(i1), jnp.asarray(i2))
    np.testing.assert_allclose(
        np.asarray(y), np.transpose(y_ref, (0, 2, 3, 1)), atol=2e-3, rtol=1e-2
    )


# ---------------------------------------------------------- CLIP text embedder


def test_clip_text_tower_parity():
    """HF CLIPTextModel (the reference's FrozenCLIPTextEmbedder transformer,
    modules.py:178-207) vs CLIPTextTower through convert_clip_text_encoder:
    last_hidden_state, EOS-pooled output, and text_projection — with a padded
    batch exercising the causal + padding attention masks."""
    transformers = pytest.importorskip("transformers")

    from vface_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
    from vface_tpu.utils.sd_convert import convert_clip_text_encoder

    cfg = CLIPTextConfig.tiny()
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.width,
        intermediate_size=cfg.width * cfg.mlp_ratio,
        num_hidden_layers=cfg.layers,
        num_attention_heads=cfg.heads,
        max_position_embeddings=cfg.max_length,
        projection_dim=cfg.projection_dim,
        eos_token_id=cfg.eos_token_id,
        bos_token_id=cfg.eos_token_id - 1,
        pad_token_id=cfg.eos_token_id,
    )
    hf = transformers.CLIPTextModelWithProjection(hf_cfg).eval()
    perturb_(hf, seed=60, scale=0.02)
    sd = hf.state_dict()

    # tokenizer-style rows: bos, payload, eos, eos-padding (row 1 shorter)
    bos, eos = cfg.eos_token_id - 1, cfg.eos_token_id
    rng = np.random.default_rng(7)
    L = 10
    ids = np.full((2, L), eos, np.int64)
    mask = np.zeros((2, L), np.int64)
    for r, n_payload in enumerate((L - 2, 5)):
        ids[r, 0] = bos
        ids[r, 1 : 1 + n_payload] = rng.integers(0, bos, n_payload)
        ids[r, 1 + n_payload] = eos
        mask[r, : n_payload + 2] = 1

    with torch.no_grad():
        out = hf(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        )
        hidden_ref = out.last_hidden_state.numpy()
        proj_ref = out.text_embeds.numpy()
        pooled_ref = hf.text_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).pooler_output.numpy()

    ours = CLIPTextEncoder(cfg)
    init = ours.init(jax.random.PRNGKey(0), jnp.zeros((1, L), jnp.int32))["params"]
    params = convert_clip_text_encoder(sd, layers=cfg.layers)
    assert_tree_complete(params, init)
    hidden, pooled, proj = ours.apply(
        {"params": to_jax_tree(params)}, jnp.asarray(ids), pad_mask=jnp.asarray(mask)
    )
    # padded positions attend through garbage keys upstream of masking in HF
    # too (they're masked as KEYS, not queries) — compare real positions only
    np.testing.assert_allclose(np.asarray(hidden), hidden_ref, atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(pooled), pooled_ref, atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(proj), proj_ref, atol=2e-4, rtol=2e-3)


def test_clip_tokenizer_parity():
    """Our from-spec BPE vs HF CLIPTokenizer instantiated from the SAME
    synthetic vocab/merges files (network-free): token strings, ids, padding
    and attention masks must match on cleaning/merge/specials edge cases."""
    transformers = pytest.importorskip("transformers")
    import json as _json
    import tempfile, os

    from vface_tpu.models.clip_tokenizer import BOS, EOS, CLIPBPETokenizer, byte_alphabet

    # synthetic vocab: full byte alphabet (+</w> forms), a few merged tokens
    # mirroring real CLIP structure, then bos/eos at the end (as in the real
    # vocab ordering)
    alpha = list(byte_alphabet().values())
    merges = [
        ("h", "e"), ("l", "l"), ("o</w>", ""), ("he", "ll"),
        ("o", "</w>"), ("hell", "o</w>"), ("w", "o"), ("r", "l"),
        ("d", "</w>"), ("wo", "rl"), ("worl", "d</w>"), ("'", "s</w>"),
        ("s", "</w>"), ("a", "</w>"), ("t", "h"), ("th", "e</w>"),
        ("e", "</w>"), ("1", "</w>"), ("!", "</w>"),
    ]
    merges = [m for m in merges if "" not in m]
    vocab = {}
    for tok in alpha + [t + "</w>" for t in alpha]:
        vocab.setdefault(tok, len(vocab))
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    vocab[BOS] = len(vocab)
    vocab[EOS] = len(vocab)

    with tempfile.TemporaryDirectory() as d:
        vp, mp = os.path.join(d, "vocab.json"), os.path.join(d, "merges.txt")
        with open(vp, "w") as f:
            _json.dump(vocab, f)
        with open(mp, "w") as f:
            f.write("#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges))
        hf = transformers.CLIPTokenizer(vp, mp)
        ours = CLIPBPETokenizer.from_files(vp, mp)

        cases = [
            "hello world",
            "Hello,  WORLD!!",          # lowercase + whitespace collapse + punct run
            "the cat's hello",          # 's contraction split
            "a1 the\tworld\n",          # digit split, control whitespace
            "héllo 中文 test",           # accents (kept), CJK spacing
            "<|startoftext|> hi",       # special token passthrough
            "",
        ]
        got = ours(cases, padding=True)
        ref = hf(cases, padding=True, return_tensors="np")
        for c in cases:
            assert ours.tokenize(c) == hf.tokenize(c), c
        np.testing.assert_array_equal(got["input_ids"], ref["input_ids"])
        np.testing.assert_array_equal(got["attention_mask"], ref["attention_mask"])


def test_clip_similarity_logits():
    """forward_probabilities semantics (modules.py:266-281): normalised
    cosine logits scaled by exp(logit_scale), torch-checked inline."""
    from vface_tpu.models.clip import clip_similarity_logits

    rng = np.random.default_rng(3)
    t = rng.normal(size=(3, 8)).astype(np.float32)
    v = rng.normal(size=(2, 8)).astype(np.float32)
    scale = 2.3
    tt, tv = torch.from_numpy(t), torch.from_numpy(v)
    ref = (
        float(np.exp(scale))
        * (tv / tv.norm(dim=-1, keepdim=True)) @ (tt / tt.norm(dim=-1, keepdim=True)).T
    ).numpy()
    got = clip_similarity_logits(jnp.asarray(t), jnp.asarray(v), jnp.float32(scale))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)
