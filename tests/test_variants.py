"""Conditioning-mode variants, dual-context attention, guided sampler, flow chains."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vface_tpu.models import ModelConfig, UNetConfig, UNetModel, VFaceModel
from vface_tpu.models.conditioning import Conditioner, ConditionerConfig


@pytest.mark.parametrize(
    "mode,expect",
    [("sum", (2, 1, 64)), ("concat", (2, 1, 64)), ("stack", (2, 3, 64)), ("sep_head", (2, 1, 128))],
)
def test_conditioning_modes(mode, expect):
    cfg = dataclasses.replace(ConditionerConfig.tiny(), mode=mode)
    m = Conditioner(cfg)
    args = (
        jnp.zeros((2, 32, 32, 3)),
        jnp.zeros((2, 136)),
        jnp.zeros((2, 32, 32, 3)),
        jnp.zeros((2, 112, 112, 3)),
    )
    p = m.init(jax.random.PRNGKey(0), *args)["params"]
    c = m.apply({"params": p}, *args)
    uc = m.apply({"params": p}, 2, method=Conditioner.uncond)
    assert c.shape == expect
    assert uc.shape == c.shape  # CFG requires matching cond/uncond shapes


def test_dual_context_unet_forward():
    """1536-d (2x context_dim) tokens route through the head-split path."""
    um = UNetModel(UNetConfig.tiny())
    x = jnp.zeros((2, 16, 16, 9))
    t = jnp.zeros((2,), jnp.int32)
    p = um.init(jax.random.PRNGKey(0), x, t, jnp.zeros((2, 1, 64)))["params"]
    out = um.apply({"params": p}, x, t, jnp.zeros((2, 1, 128)))
    assert out.shape == (2, 16, 16, 4)


def test_guided_sampler_runs(tiny_bundle):
    from vface_tpu.samplers.guided import ddim_sample_guided

    model, params = tiny_bundle
    hl = model.cfg.latent_size
    b, d = 2, model.cfg.unet.context_dim
    rng = jax.random.PRNGKey(1)
    src_emb = jax.random.normal(rng, (b, 512))
    src_emb = src_emb / jnp.linalg.norm(src_emb, axis=-1, keepdims=True)
    z0, traj = ddim_sample_guided(
        model,
        params,
        jax.random.normal(rng, (b, hl, hl, 4)),
        jax.random.normal(jax.random.PRNGKey(2), (b, 1, d)),
        jax.random.normal(jax.random.PRNGKey(3), (b, 1, d)),
        jax.random.normal(jax.random.PRNGKey(4), (b, hl, hl, 4)),
        jnp.ones((b, hl, hl, 1)),
        src_emb,
        jnp.ones((b, 32, 32, 1)) * 0.5,
        num_steps=2,
        grad_weight=0.01,
    )
    assert z0.shape == (b, hl, hl, 4)
    assert np.isfinite(np.asarray(z0)).all()


def test_flow_chain_variants():
    from vface_tpu.ops.warp import (
        align_by_flow_high_res,
        batch_flow_align,
        batch_flow_align_latent,
        warp_from_video,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 8, 4))
    zero_flow = jnp.zeros((2, 8, 8, 2))
    ident = lambda a: a
    # zero flow + alpha=0 → pure propagation of frame 0
    out = warp_from_video(x, zero_flow)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(x[0]), atol=1e-5)
    out = batch_flow_align_latent(x, zero_flow, alpha=1.0)  # alpha=1 → identity
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)
    out = align_by_flow_high_res(x, zero_flow, ident, ident, alpha=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)
    out = batch_flow_align(x, zero_flow, ident, ident, alpha=1.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_single_token_cross_attention_shortcut_bit_exact():
    """kv_len==1 cross-attention: softmax over one key is exactly 1.0, so the
    module's fast path (out = v broadcast; to_q/scores/AV dead-coded) must be
    BIT-equal to the generic einsum path in both dtypes. Guards the VFace
    image-conditioning operating point (reference ddpm.py's mapper2 emits one
    CLIP/ID token)."""
    from vface_tpu.models.unet import CrossAttention
    from vface_tpu.ops.attention import multi_head_attention

    for dtype in (jnp.float32, jnp.bfloat16):
        mod = CrossAttention(64, context_dim=32, heads=4, dtype=dtype)
        x = jax.random.normal(jax.random.PRNGKey(0), (3, 50, 64))
        ctx = jax.random.normal(jax.random.PRNGKey(1), (3, 1, 32))
        params = mod.init(jax.random.PRNGKey(2), x, ctx)
        out = mod.apply(params, x, ctx)
        p = params["params"]
        assert "to_q" in p  # params must exist for checkpoint conversion
        q = x.astype(dtype) @ p["to_q"]["kernel"].astype(dtype)
        k = ctx.astype(dtype) @ p["to_k"]["kernel"].astype(dtype)
        v = ctx.astype(dtype) @ p["to_v"]["kernel"].astype(dtype)
        o = multi_head_attention(q, k, v, 4, dtype=dtype)
        ref = o @ p["to_out"]["kernel"].astype(dtype) + p["to_out"]["bias"].astype(dtype)
        assert jnp.all(out == ref), f"shortcut not bit-exact at {dtype}"
