"""Sampler-LOOP parity: the reference ``ddim_w_inv.DDIMSampler`` end-to-end
vs our ``ddim_invert`` + ``vface_sample`` on the converted tiny UNet.

VERDICT round-2 item 5 / SURVEY hard-part 1: module-level parity cannot catch
interactions between the inversion's custom alpha indexing
(`/root/reference/REFace/ldm/models/diffusion/ddim_w_inv.py:442-449`), the
3-chunk batch layout of ``p_sample_ddim_with_inverse`` (:654-668), the
per-step attention-hook re-registration schedule (:289-308 — input_blocks ON
with ``flow_fix``, everything else OFF inside the loop), and the start-code
selection (the inversion latent at ``timesteps[-2]``,
`scripts/VFace_inference_batch.py:541`). This test runs the reference's OWN
sampler loop (imported from the reference tree, with its pnp hook machinery
monkey-patching the reference torch UNet) against our jitted scan, and
asserts z0 parity — separately for the faithful 3-chunk path and the
recon-free 2-chunk path (whose bit-equality claim rides on the recon chunk
being dead compute).

Import shims (infrastructure only, no semantics): torchvision/kornia are
absent in this environment — stubs satisfy module-level imports
(``raft_large`` is instantiated at ``temporal_flow`` import time but never
called here: at the tiny UNet's token counts the hook's flow branch
``q.shape[1]==4096`` is statically false, matching the reference gate).
``DDIMSampler.register_buffer`` force-moves tensors to CUDA (:148-152) — on
this CPU-only host it is patched to a plain setattr.
"""

import os
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

    created = []

    def ensure(name, **attrs):
        if name in sys.modules:
            mod = sys.modules[name]
        else:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
            created.append(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        return mod

    class _DummyRaft:
        def to(self, *a, **k):
            return self

        def eval(self):
            return self

        def __call__(self, *a, **k):  # pragma: no cover - never used
            raise RuntimeError("stub raft")

    tv = ensure("torchvision")
    tvt = ensure(
        "torchvision.transforms",
        Resize=lambda *a, **k: (lambda x: x),
        Compose=lambda fs: (lambda x: x),
    )
    tvtf = ensure(
        "torchvision.transforms.functional",
        normalize=lambda x, mean, std: x,
        resize=lambda x, s, **k: x,
        to_pil_image=lambda x: x,
    )
    tvio = ensure(
        "torchvision.io",
        read_video=lambda *a, **k: None,
        write_video=lambda *a, **k: None,
    )
    tvm = ensure("torchvision.models")
    tvmo = ensure(
        "torchvision.models.optical_flow", raft_large=lambda **k: _DummyRaft()
    )
    tvu = ensure("torchvision.utils", flow_to_image=lambda x: x)
    tv.transforms = tvt
    tvt.functional = tvtf
    tv.io = tvio
    tv.models = tvm
    tvm.optical_flow = tvmo
    tv.utils = tvu

    def create_meshgrid(H, W, normalized_coordinates=False, device=None):
        ys, xs = torch.meshgrid(
            torch.arange(H, dtype=torch.float32),
            torch.arange(W, dtype=torch.float32),
            indexing="ij",
        )
        if normalized_coordinates:
            xs = 2.0 * xs / max(W - 1, 1) - 1.0
            ys = 2.0 * ys / max(H - 1, 1) - 1.0
        return torch.stack([xs, ys], dim=-1)[None]

    kornia = ensure("kornia")
    kornia.utils = ensure("kornia.utils", create_meshgrid=create_meshgrid)
    kornia.geometry = ensure(
        "kornia.geometry", warp_affine=lambda *a, **k: (_ for _ in ()).throw(RuntimeError)
    )
    yield
    # evict the stubs so later test modules (e.g. transformers' torchvision
    # availability probe in test_reference_parity) see a clean sys.modules,
    # plus the reference modules that captured them
    for name in created + [
        "ldm.models.pnp_utils",
        "ldm.models.diffusion.ddim_w_inv",
        "scripts.face_swap_utils",
        "scripts.temporal_flow",
    ]:
        sys.modules.pop(name, None)


def _perturb(module, seed, scale=0.02):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for t in list(module.parameters()) + list(module.buffers()):
            if t.is_floating_point():
                t.add_(scale * torch.randn(t.shape, generator=g))


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _build_fake_ldm(ucfg, T, lin_start, lin_end):
    """Minimal LatentDiffusion stand-in: the reference sampler needs
    num_timesteps, betas/alphas_cumprod(_prev) buffers, .device, apply_model,
    and .model.diffusion_model for the pnp hook walker (pnp_utils.py:290)."""
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet

    unet = TorchUNet(
        image_size=16,
        in_channels=ucfg.in_channels,
        out_channels=ucfg.out_channels,
        model_channels=ucfg.model_channels,
        attention_resolutions=list(ucfg.attention_resolutions),
        num_res_blocks=ucfg.num_res_blocks,
        channel_mult=list(ucfg.channel_mult),
        num_heads=ucfg.num_heads,
        use_spatial_transformer=True,
        transformer_depth=ucfg.transformer_depth,
        context_dim=ucfg.context_dim,
        use_checkpoint=False,
        legacy=False,
    ).eval()
    _perturb(unet, seed=303)

    class Wrapper(torch.nn.Module):
        def __init__(self, net):
            super().__init__()
            self.diffusion_model = net

    class FakeLDM(torch.nn.Module):
        def __init__(self, net):
            super().__init__()
            self.model = Wrapper(net)
            self.num_timesteps = T
            self.parameterization = "eps"
            betas = (
                np.linspace(lin_start**0.5, lin_end**0.5, T, dtype=np.float64) ** 2
            )
            acp = np.cumprod(1.0 - betas)
            acp_prev = np.append(1.0, acp[:-1])
            self.register_buffer("betas", torch.from_numpy(betas.astype(np.float32)))
            self.register_buffer(
                "alphas_cumprod", torch.from_numpy(acp.astype(np.float32))
            )
            self.register_buffer(
                "alphas_cumprod_prev", torch.from_numpy(acp_prev.astype(np.float32))
            )
            self.register_buffer(
                "sqrt_one_minus_alphas_cumprod",
                torch.from_numpy(np.sqrt(1.0 - acp).astype(np.float32)),
            )

        @property
        def device(self):
            return torch.device("cpu")

        def apply_model(self, x, t, c, return_features=False):
            return self.model.diffusion_model(x, t, c)

    return FakeLDM(unet), unet


@pytest.fixture(scope="module")
def setup(_reference_importable, tmp_path_factory):
    """Shared reference run (inversion + both sampler variants' inputs)."""
    from vface_tpu.models.ldm import ModelConfig, VFaceModel
    from vface_tpu.utils.sd_convert import convert_sd_unet

    model_cfg = ModelConfig.tiny()
    model = VFaceModel(model_cfg)
    fake, tunet = _build_fake_ldm(
        model_cfg.unet, model_cfg.timesteps, model_cfg.linear_start, model_cfg.linear_end
    )
    sd = {f"model.diffusion_model.{k}": v for k, v in tunet.state_dict().items()}
    params = {"unet": jax.tree_util.tree_map(jnp.asarray, convert_sd_unet(sd, model_cfg.unet))}

    rng = np.random.default_rng(31)
    F, hl, d = 2, 16, model_cfg.unet.context_dim
    data = dict(
        z_tar=rng.normal(size=(F, hl, hl, 4)).astype(np.float32),
        z_src=rng.normal(size=(F, hl, hl, 4)).astype(np.float32),
        inp_t=rng.normal(size=(F, hl, hl, 4)).astype(np.float32),
        m_t=rng.uniform(0, 1, (F, hl, hl, 1)).astype(np.float32),
        inp_s=rng.normal(size=(F, hl, hl, 4)).astype(np.float32),
        m_s=rng.uniform(0, 1, (F, hl, hl, 1)).astype(np.float32),
        inv_cond=rng.normal(size=(F, 1, d)).astype(np.float32),
        src_cond=rng.normal(size=(F, 1, d)).astype(np.float32),
        c_swap=rng.normal(size=(F, 1, d)).astype(np.float32),
        uc=rng.normal(size=(F, 1, d)).astype(np.float32),
    )

    from ldm.models.diffusion.ddim_w_inv import DDIMSampler

    # register_buffer force-moves to CUDA (ddim_w_inv.py:148-152) — CPU host
    DDIMSampler.register_buffer = lambda self, name, attr: setattr(self, name, attr)
    sampler = DDIMSampler(fake)

    S = 5
    inv_dir = str(tmp_path_factory.mktemp("inv"))
    kwargs_inv = dict(
        test_model_kwargs=dict(
            inpaint_image=torch.cat([_nchw(data["inp_t"]), _nchw(data["inp_s"])]),
            inpaint_mask=torch.cat([_nchw(data["m_t"]), _nchw(data["m_s"])]),
        )
    )
    with torch.no_grad():
        x_noisy, _ = sampler.ddim_invert(
            x=torch.cat([_nchw(data["z_tar"]), _nchw(data["z_src"])]),
            cond=torch.from_numpy(np.concatenate([data["inv_cond"], data["src_cond"]])),
            S=S,
            shape=(4, hl, hl),
            eta=0.0,
            unconditional_guidance_scale=3.0,
            unconditional_conditioning=None,  # driver passes None → no CFG
            inverse_dir=inv_dir,
            batch_size=F,
            **kwargs_inv,
        )
    ts = sampler.ddim_timesteps
    start = torch.load(os.path.join(inv_dir, f"ddim_latents_{ts[-2]}.pt"))

    with torch.no_grad():
        ref_z0, _ = sampler.sample(
            S=S,
            conditioning=torch.from_numpy(data["c_swap"]),
            target_conditioning=torch.from_numpy(data["inv_cond"]),
            inverse_results_dir=inv_dir,
            batch_size=F,
            shape=(4, hl, hl),
            verbose=False,
            unconditional_guidance_scale=3.0,
            unconditional_conditioning=torch.from_numpy(data["uc"]),
            eta=0.0,
            x_T=start,
            flow=None,
            test_model_kwargs=dict(
                inpaint_image=_nchw(data["inp_t"]), inpaint_mask=_nchw(data["m_t"])
            ),
        )
    saved = {
        int(t): np.transpose(
            torch.load(os.path.join(inv_dir, f"ddim_latents_{t}.pt")).numpy(),
            (0, 2, 3, 1),
        )
        for t in ts
    }
    return dict(
        model=model,
        params=params,
        data=data,
        S=S,
        ts=ts,
        ref_z0=np.transpose(ref_z0.numpy(), (0, 2, 3, 1)),
        saved=saved,
    )


def test_inversion_loop_parity(setup):
    """Our ddim_invert's per-step latent stack == the reference's saved
    ddim_latents_{t}.pt files (alpha-indexing quirk included)."""
    from vface_tpu.samplers.inversion import ddim_invert

    d = setup["data"]
    model, params = setup["model"], setup["params"]
    _, lat = ddim_invert(
        model,
        params,
        jnp.asarray(np.concatenate([d["z_tar"], d["z_src"]])),
        jnp.asarray(np.concatenate([d["inv_cond"], d["src_cond"]])),
        jnp.asarray(np.concatenate([d["inp_t"], d["inp_s"]])),
        jnp.asarray(np.concatenate([d["m_t"], d["m_s"]])),
        num_steps=setup["S"],
        keep=2,
    )
    lat = np.asarray(lat)
    for i, t in enumerate(setup["ts"]):
        np.testing.assert_allclose(
            lat[i], setup["saved"][int(t)], atol=5e-4, rtol=5e-3,
            err_msg=f"inversion latents diverge at t={t}",
        )


def _our_sample(setup, drop_recon):
    from vface_tpu.models.unet import InjectionSpec
    from vface_tpu.ops.attention import FusionConfig
    from vface_tpu.samplers.inversion import ddim_invert
    from vface_tpu.samplers.vface import vface_sample

    d = setup["data"]
    model, params = setup["model"], setup["params"]
    _, lat = ddim_invert(
        model,
        params,
        jnp.asarray(np.concatenate([d["z_tar"], d["z_src"]])),
        jnp.asarray(np.concatenate([d["inv_cond"], d["src_cond"]])),
        jnp.asarray(np.concatenate([d["inp_t"], d["inp_s"]])),
        jnp.asarray(np.concatenate([d["m_t"], d["m_s"]])),
        num_steps=setup["S"],
        keep=2,
    )
    # the active hook schedule (ddim_w_inv.py:300-308): input_blocks ON with
    # flow_fix, middle/output OFF — constant across steps
    spec = InjectionSpec(
        input_blocks=FusionConfig(mode="flow_fix"),
        middle=FusionConfig(),
        output_blocks=FusionConfig(),
    )
    z0, _ = vface_sample(
        model,
        params,
        x_T=lat[-2],
        cond=jnp.asarray(d["c_swap"]),
        uncond=jnp.asarray(d["uc"]),
        target_cond=jnp.asarray(d["inv_cond"]),
        inv_latents=lat,
        inpaint_latent=jnp.asarray(d["inp_t"]),
        mask_latent=jnp.asarray(d["m_t"]),
        injection=spec,
        flow=None,
        num_steps=setup["S"],
        cfg_scale=3.0,
        drop_recon_chunk=drop_recon,
    )
    return np.asarray(z0)


def test_sampler_loop_parity_3chunk(setup):
    """Faithful 3-chunk hooked loop == the reference sampler's z0."""
    z0 = _our_sample(setup, drop_recon=False)
    np.testing.assert_allclose(z0, setup["ref_z0"], atol=2e-3, rtol=1e-2)


def test_sampler_loop_parity_recon_free(setup):
    """The recon-free 2-chunk fast path is output-identical to the reference
    3-chunk loop (the TSG recon chunk is dead compute — ddim_w_inv.py:654-738
    computes but never returns e_t_recon/x_prev_recon)."""
    z0 = _our_sample(setup, drop_recon=True)
    np.testing.assert_allclose(z0, setup["ref_z0"], atol=2e-3, rtol=1e-2)
