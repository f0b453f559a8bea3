"""p_losses_face parity vs a torch oracle of the reference loss (runtime-exact).

VERDICT round-2 item 3: the flagship training loss had three fidelity gaps
(flipped-reference recon cond, per-intermediate ID loss vs the flipped
identity, avg-pooled multi-scale LPIPS). This test pins the WHOLE loss
structure against a hand-built torch computation of the reference
``p_losses_face`` (`/root/reference/REFace/ldm/models/diffusion/ddpm.py:1679-1837`)
including its runtime quirks:

* posterior SAMPLING of both VAE encodes (shared eps draws);
* conditioning_with_feat with Source+Target CLIP branches, l2-normalised
  ArcFace branch, landmark branch, and the weight_division-by-default
  combination (ddpm.py:645-647, 1039-1045);
* uncond dropout via the learnable vector (shared drop mask);
* eps-MSE at shared random t/noise;
* recon chain re-using the SAME noise at t=T-1 (ddpm.py:1699), the flipped
  reference cond (1715-1717), the [748,499,250,1] timestep chain with
  4-step-table coefficients (ddim.py:455-478, 550-556), and the
  intermediates list seeded with the noisy start latent (ddim.py:482);
* per-intermediate masked ID loss vs the flipped reference identity
  (1755-1773) and summed 3-scale adaptive-avg-pool perceptual loss vs GT
  (1781-1788). The perceptual metric itself is injected as plain MSE on both
  sides — the LPIPS *network* has its own converter parity test
  (test_reference_parity.py::test_lpips_parity); here we verify the loss
  STRUCTURE around it.

All stochastic draws are generated once in numpy and fed to both sides
(`p_losses_face(fixed=...)`).
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference/REFace"

CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


@pytest.fixture(scope="module", autouse=True)
def _reference_importable():
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
    yield


def _perturb(module, seed, scale=0.02):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for t in list(module.parameters()) + list(module.buffers()):
            if t.is_floating_point():
                t.add_(scale * torch.randn(t.shape, generator=g))


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _adaptive_pool(x, size):
    return torch.nn.functional.adaptive_avg_pool2d(x, (size, size))


class _TinyArcBackbone(torch.nn.Module):
    """Reference Backbone topology (model_irse.py:9-42) at our tiny stage plan
    ((16,1),(32,1)) — built from the reference's own bottleneck_IR_SE blocks
    so the state_dict names match convert_arcface."""

    def __init__(self):
        super().__init__()
        from src.Face_models.encoders.helpers import Flatten, bottleneck_IR_SE

        nn = torch.nn
        self.input_layer = nn.Sequential(
            nn.Conv2d(3, 64, 3, 1, 1, bias=False), nn.BatchNorm2d(64), nn.PReLU(64)
        )
        self.body = nn.Sequential(
            bottleneck_IR_SE(64, 16, 2), bottleneck_IR_SE(16, 32, 2)
        )
        self.output_layer = nn.Sequential(
            nn.BatchNorm2d(32),
            nn.Dropout(0.0),
            Flatten(),
            nn.Linear(32 * 28 * 28, 512),
            nn.BatchNorm1d(512),
        )

    def forward(self, x):
        h = self.output_layer(self.body(self.input_layer(x)))
        return h / h.norm(dim=-1, keepdim=True)  # l2_norm (model_irse.py:69)


def _build_torch_side(model_cfg):
    """All reference torch modules matching ModelConfig.tiny(), perturbed."""
    import transformers
    from ldm.modules.diffusionmodules.model import Decoder as TDec, Encoder as TEnc
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet
    from ldm.modules.encoders.xf import LayerNorm as XfLN, Transformer as XfTransformer

    ucfg, vcfg, ccfg = model_cfg.unet, model_cfg.vae, model_cfg.cond
    d = ccfg.context_dim
    unet = TorchUNet(
        image_size=model_cfg.latent_size,
        in_channels=ucfg.in_channels,
        out_channels=ucfg.out_channels,
        model_channels=ucfg.model_channels,
        attention_resolutions=list(ucfg.attention_resolutions),
        num_res_blocks=ucfg.num_res_blocks,
        channel_mult=list(ucfg.channel_mult),
        num_heads=ucfg.num_heads,
        use_spatial_transformer=True,
        transformer_depth=ucfg.transformer_depth,
        context_dim=d,
        use_checkpoint=False,
        legacy=False,
    ).eval()
    dd = dict(
        ch=vcfg.ch,
        out_ch=vcfg.out_channels,
        ch_mult=tuple(vcfg.ch_mult),
        num_res_blocks=vcfg.num_res_blocks,
        attn_resolutions=[],
        dropout=0.0,
        in_channels=vcfg.in_channels,
        resolution=model_cfg.image_size,
        z_channels=vcfg.z_channels,
        double_z=vcfg.double_z,
    )
    enc, dec = TEnc(**dd).eval(), TDec(**dd).eval()
    qc = torch.nn.Conv2d(2 * vcfg.z_channels, 2 * vcfg.embed_dim, 1).eval()
    pqc = torch.nn.Conv2d(vcfg.embed_dim, vcfg.z_channels, 1).eval()

    clip_cfg = ccfg.clip
    hf_cfg = transformers.CLIPConfig(
        text_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=1, num_attention_heads=2
        ),
        vision_config=dict(
            hidden_size=clip_cfg.width,
            intermediate_size=clip_cfg.width * clip_cfg.mlp_ratio,
            num_hidden_layers=clip_cfg.layers,
            num_attention_heads=clip_cfg.heads,
            image_size=clip_cfg.image_size,
            patch_size=clip_cfg.patch_size,
        ),
        projection_dim=d,
    )
    hf = transformers.CLIPModel(hf_cfg).eval()
    mapper2 = XfTransformer(1, d, 5, 1).eval()
    final_ln2 = XfLN(d).eval()
    arc = _TinyArcBackbone().eval()
    proj_src = torch.nn.Linear(d, d).eval()
    proj_tar = torch.nn.Linear(d, d).eval()
    id_proj = torch.nn.Linear(512, d).eval()
    lm_proj = torch.nn.Linear(136, d).eval()
    g = torch.Generator().manual_seed(77)
    learnable_vector = torch.randn(1, 1, d, generator=g)

    mods = dict(
        unet=unet, enc=enc, dec=dec, qc=qc, pqc=pqc, hf=hf, mapper2=mapper2,
        final_ln2=final_ln2, arc=arc, proj_src=proj_src, proj_tar=proj_tar,
        id_proj=id_proj, lm_proj=lm_proj,
    )
    for i, m in enumerate(mods.values()):
        _perturb(m, seed=100 + i)
    mods["learnable_vector"] = learnable_vector
    return mods


def _convert_params(mods, model_cfg, init_tree):
    from vface_tpu.utils.sd_convert import (
        convert_clip_conditioner,
        convert_reface_heads,
        convert_sd_unet,
        convert_sd_vae,
    )
    from vface_tpu.utils.torch_convert import convert_arcface, verify_tree

    sd_unet = {f"model.diffusion_model.{k}": v for k, v in mods["unet"].state_dict().items()}
    sd_vae = {}
    for prefix, m in (
        ("first_stage_model.encoder", mods["enc"]),
        ("first_stage_model.decoder", mods["dec"]),
        ("first_stage_model.quant_conv", mods["qc"]),
        ("first_stage_model.post_quant_conv", mods["pqc"]),
    ):
        sd_vae.update({f"{prefix}.{k}": v for k, v in m.state_dict().items()})
    sd_clip = {f"cond_stage_model.model.{k}": v for k, v in mods["hf"].state_dict().items()}
    sd_clip.update(
        {f"cond_stage_model.mapper2.{k}": v for k, v in mods["mapper2"].state_dict().items()}
    )
    sd_clip.update(
        {f"cond_stage_model.final_ln2.{k}": v for k, v in mods["final_ln2"].state_dict().items()}
    )
    sd_heads = {}
    for name, m in (
        ("proj_out_source", mods["proj_src"]),
        ("proj_out_target", mods["proj_tar"]),
        ("ID_proj_out", mods["id_proj"]),
        ("landmark_proj_out", mods["lm_proj"]),
    ):
        sd_heads.update({f"{name}.{k}": v for k, v in m.state_dict().items()})
    sd_heads["learnable_vector"] = mods["learnable_vector"]

    cond_tree = convert_clip_conditioner(sd_clip, layers=model_cfg.cond.clip.layers)
    cond = {"clip_encoder": cond_tree}
    cond["arcface"] = convert_arcface(mods["arc"].state_dict())
    cond.update(convert_reface_heads(sd_heads))
    params = {
        "unet": convert_sd_unet(sd_unet, model_cfg.unet),
        "vae": convert_sd_vae(sd_vae, model_cfg.vae),
        "cond": cond,
    }
    problems = [p for p in verify_tree(params, init_tree) if p[1] != "unexpected"]
    assert not problems, f"converter problems: {problems[:10]}"
    return jax.tree_util.tree_map(jnp.asarray, params)


def _torch_conditioning(mods, ref_clip, lm136, gt, ccfg):
    """conditioning_with_feat, shipped flags (ddpm.py:872-1045 runtime):
    Source+Target CLIP branches, l2-normed ArcFace branch, landmark branch,
    weight_division True by default."""

    def clip_branch(px):
        pooled = mods["hf"].vision_model(pixel_values=px).pooler_output
        z = mods["hf"].visual_projection(pooled)[:, None]
        return mods["final_ln2"](mods["mapper2"](z))

    c = mods["proj_src"](clip_branch(ref_clip))
    # target branch: un_norm(gt) → CLIP-normalise → resize(224→clip size is a
    # no-op at tiny sizes) (ddpm.py:907-915)
    gt01 = (gt + 1.0) * 0.5
    tarn = (gt01 - torch.from_numpy(CLIP_MEAN)[None, :, None, None]) / torch.from_numpy(
        CLIP_STD
    )[None, :, None, None]
    c = c + mods["proj_tar"](clip_branch(tarn))
    # ArcFace branch: extract_feats(x, clip_img=True) (ddpm.py:113-121, 1010)
    ref01 = ref_clip * torch.from_numpy(CLIP_STD)[None, :, None, None] + torch.from_numpy(
        CLIP_MEAN
    )[None, :, None, None]
    xm11 = ref01 * 2.0 - 1.0
    xm11 = _adaptive_pool(xm11, 256) if xm11.shape[2] != 256 else xm11
    xm11 = xm11[:, :, 35:223, 32:220]
    feats = mods["arc"](_adaptive_pool(xm11, 112))
    c2 = mods["id_proj"](feats)[:, None]
    lm = mods["lm_proj"](lm136)[:, None]
    w = (ccfg.clip_weight, ccfg.id_weight, ccfg.landmarks_weight)
    return (c * w[0] + c2 * w[1] + lm * w[2]) / sum(w)


def _torch_loss(mods, model_cfg, tcfg, batch, fixed):
    """The reference p_losses_face, runtime-exact, in torch."""
    scale = model_cfg.scale_factor
    T = model_cfg.timesteps
    S = tcfg.reconstruct_steps
    betas = np.linspace(
        model_cfg.linear_start**0.5, model_cfg.linear_end**0.5, T, dtype=np.float64
    ) ** 2
    acp = np.cumprod(1.0 - betas)

    gt = _nchw(batch["gt_image"])
    inpaint = _nchw(batch["inpaint"])
    mask = _nchw(batch["mask"])
    ref_clip = _nchw(batch["ref_clip"])
    lm136 = torch.from_numpy(batch["landmarks"])
    b = gt.shape[0]
    hl = model_cfg.latent_size

    def encode(img, eps):
        moments = mods["qc"](mods["enc"](img))
        mean, logvar = moments.chunk(2, dim=1)
        logvar = torch.clamp(logvar, -30.0, 20.0)
        return (mean + torch.exp(0.5 * logvar) * _nchw(eps)) * scale

    def decode(z):
        return mods["dec"](mods["pqc"](z / scale))

    z0 = encode(gt, fixed["enc_eps0"])
    z_inpaint = encode(inpaint, fixed["enc_eps1"])
    # torchvision Resize == F.interpolate(bilinear, align_corners=False)
    mask_lat = torch.nn.functional.interpolate(mask, size=(hl, hl), mode="bilinear", align_corners=False)

    cond = _torch_conditioning(mods, ref_clip, lm136, gt, model_cfg.cond)
    drop = torch.from_numpy(fixed["drop"])
    cond = torch.where(drop, mods["learnable_vector"].to(cond.dtype), cond)

    t = torch.from_numpy(fixed["t"]).long()
    noise = _nchw(fixed["noise"])
    sa = torch.from_numpy(np.sqrt(acp).astype(np.float32))
    s1m = torch.from_numpy(np.sqrt(1.0 - acp).astype(np.float32))
    z_noisy = sa[t][:, None, None, None] * z0 + s1m[t][:, None, None, None] * noise
    x9 = torch.cat([z_noisy, z_inpaint, mask_lat], dim=1)
    eps_pred = mods["unet"](x9, t, cond)
    loss_simple = ((eps_pred - noise) ** 2).mean(dim=(1, 2, 3))
    loss = tcfg.l_simple_weight * loss_simple.mean()

    # --- recon chain (ddpm.py:1696-1729 + ddim.py:455-556 runtime) ---
    t_new = torch.full((b,), T - 1, dtype=torch.long)
    z_hi = sa[t_new][:, None, None, None] * z0 + s1m[t_new][:, None, None, None] * noise
    ref_clip_f = torch.flip(ref_clip, [0])
    cond_rec = _torch_conditioning(mods, ref_clip_f, lm136, gt, model_cfg.cond)

    skip = max((T - 1 - 1) // S, 1)
    seq = list(range(1, T - 1 - 1, skip))[:S][::-1]
    ddim_ts = np.arange(0, T, T // S) + 1
    a_tab = acp[ddim_ts]
    a_prev_tab = np.concatenate([[acp[0]], acp[ddim_ts[:-1]]])

    x = z_hi
    inters = [x]
    total = len(seq)
    for i in range(total):
        index = total - 1 - i
        ts = torch.full((b,), seq[i], dtype=torch.long)
        e_t = mods["unet"](torch.cat([x, z_inpaint, mask_lat], dim=1), ts, cond_rec)
        a_t = float(a_tab[index])
        a_prev = float(a_prev_tab[index])
        pred_x0 = (x - np.sqrt(1.0 - a_t) * e_t) / np.sqrt(a_t)
        x = np.sqrt(a_prev) * pred_x0 + np.sqrt(max(1.0 - a_prev, 0.0)) * e_t
        if index % 100 == 0 or index == total - 1:
            inters.append(pred_x0)

    decs = [decode(z) for z in inters]
    H = gt.shape[2]
    face_region = 1.0 - torch.nn.functional.interpolate(
        mask_lat, size=(H, H), mode="bilinear", align_corners=False
    )
    ref01_f = ref_clip_f * torch.from_numpy(CLIP_STD)[None, :, None, None] + torch.from_numpy(
        CLIP_MEAN
    )[None, :, None, None]

    def id_feats_m11(xm11):
        y = _adaptive_pool(xm11, 256) if xm11.shape[2] != 256 else xm11
        y = y[:, :, 35:223, 32:220]
        return mods["arc"](_adaptive_pool(y, 112))

    feats_ref = id_feats_m11(ref01_f * 2.0 - 1.0).detach()
    idl = 0.0
    for d in decs:
        f = id_feats_m11(d * face_region)
        idl = idl + (1.0 - (f * feats_ref).sum(-1)).mean()
    idl = idl / len(decs)
    loss = loss + tcfg.id_loss_weight * idl

    lp = 0.0
    for d in decs:
        for i in range(3):
            a = _adaptive_pool(d, H // 2**i)
            g = _adaptive_pool(gt, H // 2**i)
            lp = lp + ((a - g) ** 2).mean(dim=(1, 2, 3)).mean()
    loss = loss + tcfg.lpips_loss_weight * lp
    return dict(
        loss=float(loss),
        loss_simple=float(loss_simple.mean()),
        loss_id=float(idl),
        loss_lpips=float(lp),
    )


def test_train_loss_parity():
    from vface_tpu.models.ldm import ModelConfig, VFaceModel
    from vface_tpu.pipelines.train import TrainConfig, p_losses_face

    model_cfg = ModelConfig.tiny()
    model = VFaceModel(model_cfg)
    init = jax.jit(model.init)(jax.random.PRNGKey(0))

    mods = _build_torch_side(model_cfg)
    params = _convert_params(mods, model_cfg, init)

    rng = np.random.default_rng(123)
    b, H = 2, model_cfg.image_size
    sz = model_cfg.cond.clip.image_size
    hl = model_cfg.latent_size
    ref01 = rng.uniform(0.05, 0.95, (b, sz, sz, 3)).astype(np.float32)
    batch_np = dict(
        gt_image=rng.uniform(-0.9, 0.9, (b, H, H, 3)).astype(np.float32),
        inpaint=rng.uniform(-0.9, 0.9, (b, H, H, 3)).astype(np.float32),
        mask=rng.uniform(0, 1, (b, H, H, 1)).astype(np.float32),
        ref_clip=((ref01 - CLIP_MEAN) / CLIP_STD).astype(np.float32),
        landmarks=rng.uniform(0, 1, (b, 136)).astype(np.float32),
    )
    fixed = dict(
        t=rng.integers(0, model_cfg.timesteps, size=(b,)).astype(np.int64),
        noise=rng.normal(size=(b, hl, hl, 4)).astype(np.float32),
        drop=np.asarray([True, False])[:, None, None],
        enc_eps0=rng.normal(size=(b, hl, hl, 4)).astype(np.float32),
        enc_eps1=rng.normal(size=(b, hl, hl, 4)).astype(np.float32),
    )

    tcfg = TrainConfig()
    with torch.no_grad():
        ref = _torch_loss(mods, model_cfg, tcfg, batch_np, fixed)

    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    # ref_face01 = un_norm_clip(ref_clip): what the reference derives
    # in-model (ddpm.py:113-116, 1756)
    batch["ref_face01"] = jnp.asarray(ref01)
    mse_fn = lambda a, g: jnp.mean((a - g) ** 2, axis=(1, 2, 3))  # noqa: E731
    loss, logs = p_losses_face(
        model,
        params,
        batch,
        jax.random.PRNGKey(0),
        tcfg,
        perceptual_fn=mse_fn,
        fixed={k: jnp.asarray(v) for k, v in fixed.items()},
    )
    assert np.isclose(float(logs["loss_simple"]), ref["loss_simple"], rtol=2e-3, atol=2e-4)
    assert np.isclose(float(logs["loss_id"]), ref["loss_id"], rtol=5e-3, atol=1e-3)
    assert np.isclose(float(logs["loss_lpips"]), ref["loss_lpips"], rtol=5e-3, atol=1e-3)
    assert np.isclose(float(loss), ref["loss"], rtol=5e-3, atol=1e-3)
