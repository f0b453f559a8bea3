"""Flagship-SCALE UNet parity probe (round-2 VERDICT item 6).

All regular parity tests run tiny configs; a head-split or block-boundary bug
that only manifests at the SD scale (320 model channels, 8 heads, dh=40,
channel_mult (1,2,4,4), 768-d context — configs/train.yaml:32-47) would pass
them. This probe runs the FULL 320-ch UNet once, on CPU fp32 at 32×32
latents / B=1, against the reference ``UNetModel`` through ``convert_sd_unet``
— for both the standard 768-d context and the dual 1536-d context whose
[6, 2] head-split k/v routing lives at
`/root/reference/REFace/ldm/modules/attention.py:183-199`.

Gated behind ``VFACE_SLOW=1`` (several minutes + ~12 GB RAM on the 1-core CPU
host — too heavy for the default suite). Run:

    VFACE_SLOW=1 python -m pytest tests/test_flagship_parity.py -q

Last recorded run: see PLAN.md round-3 tracker.
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

pytestmark = pytest.mark.skipif(
    os.environ.get("VFACE_SLOW") != "1",
    reason="flagship-scale probe: set VFACE_SLOW=1 (minutes of CPU, ~12 GB RAM)",
)


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


def test_flagship_unet_eps_parity_including_dual_context():
    from ldm.modules.diffusionmodules.openaimodel import UNetModel as TorchUNet

    from vface_tpu.models.unet import UNetConfig, UNetModel
    from vface_tpu.utils.sd_convert import convert_sd_unet

    cfg = UNetConfig.sd_v1_inpaint(dtype=jnp.float32, use_flash=False)
    tm = TorchUNet(
        image_size=32,
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
    # perturb so zero-init output convs can't hide converter bugs
    g = torch.Generator().manual_seed(9)
    with torch.no_grad():
        for t in tm.parameters():
            if t.is_floating_point():
                t.add_(0.01 * torch.randn(t.shape, generator=g))
    sd = {f"model.diffusion_model.{k}": v for k, v in tm.state_dict().items()}

    rng = np.random.default_rng(77)
    x = rng.normal(size=(1, 32, 32, 9)).astype(np.float32)
    t = np.asarray([500], np.int64)
    c768 = rng.normal(scale=0.5, size=(1, 1, 768)).astype(np.float32)
    c1536 = rng.normal(scale=0.5, size=(1, 1, 1536)).astype(np.float32)

    def nchw(a):
        return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)).copy())

    with torch.no_grad():
        y768 = tm(nchw(x), torch.from_numpy(t), torch.from_numpy(c768.copy()))
        y1536 = tm(nchw(x), torch.from_numpy(t), torch.from_numpy(c1536.copy()))

    unet = UNetModel(cfg)
    params = jax.tree_util.tree_map(jnp.asarray, convert_sd_unet(sd, cfg))
    del sd, tm

    fwd = jax.jit(lambda p, x_, t_, c_: unet.apply({"params": p}, x_, t_, c_))
    for ctx, y_ref, name in ((c768, y768, "768"), (c1536, y1536, "1536 head-split")):
        y = fwd(params, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx))
        ref = np.transpose(y_ref.numpy(), (0, 2, 3, 1))
        err = np.max(np.abs(np.asarray(y) - ref))
        rel = err / (np.abs(ref).max() + 1e-9)
        print(f"[flagship] ctx {name}: max abs err {err:.2e} (rel {rel:.2e})")
        np.testing.assert_allclose(np.asarray(y), ref, atol=5e-4, rtol=5e-3)
