"""SD-v1-4 UNet (9-channel inpainting variant) with first-class injection.

Capability parity with the reference UNet
(`/root/reference/REFace/ldm/modules/diffusionmodules/openaimodel.py:528-908`,
config `configs/train.yaml:32-47`: in 9 / out 4 / model_channels 320 /
ch_mult (1,2,4,4) / 2 res blocks / attention at ds {1,2,4} / 8 heads /
context_dim 768 / transformer_depth 1) — redesigned TPU-first:

* NHWC, params fp32, compute dtype configurable (bfloat16 on TPU).
* The reference's plug-and-play attention hooks (monkey-patched
  ``CrossAttention.forward`` per sampling step,
  `ldm/models/pnp_utils.py:57-339`) are replaced by an
  :class:`InjectionSpec` — a *static, hashable* description of which site
  class (input / middle / output blocks) applies which fusion — threaded
  through the forward as a plain argument. Optical flow for FGATS rides along
  as a traced array. Under ``jit`` each distinct spec traces once; the active
  VFace schedule uses one spec for all 50 steps (input blocks = ``flow_fix``,
  rest off — `ddim_w_inv.py:300-308`).
* ``return_features`` returns every output-block activation
  (openaimodel.py:897-905), used by the landmark loss head.
* ``use_remat`` wraps res/transformer blocks in ``jax.checkpoint`` —
  the TPU analogue of the reference's ``use_checkpoint: True``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vface_tpu.models.layers import Conv, Dense, GroupNorm32, LayerNormF32, nonlinearity, upsample_nearest_2x
from vface_tpu.ops.attention import FusionConfig, fuse_qkv, multi_head_attention
from vface_tpu.utils.schedule import timestep_embedding

NONE = FusionConfig("none")


@dataclasses.dataclass(frozen=True)
class InjectionSpec:
    """Static per-site-class fusion spec (the functional form of pnp hooks).

    The reference registers hooks by block list (pnp_utils.py:289-339); its
    active schedule only ever distinguishes input vs middle vs output blocks,
    so that is the granularity exposed here.
    """

    input_blocks: FusionConfig = NONE
    middle: FusionConfig = NONE
    output_blocks: FusionConfig = NONE
    chunks: int = 3
    # TSG conv injection at output_blocks[3]'s ResBlock (pnp_utils.py:379-383)
    conv_inject: bool = False

    def for_site(self, site: str) -> FusionConfig:
        return {"in": self.input_blocks, "mid": self.middle, "out": self.output_blocks}[site]

    @classmethod
    def vface_active(cls, split_ratio: float = 0.8, flow_alpha: float = 0.8):
        """The schedule actually in effect inside the VFace sampling loop
        (ddim_w_inv.py:300-308): input-block attn1 = FSAI+FGATS, rest off."""
        return cls(
            input_blocks=FusionConfig(
                "flow_fix", split_ratio=split_ratio, flow_alpha=flow_alpha
            )
        )


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 9
    out_channels: int = 4
    model_channels: int = 320
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (1, 2, 4)  # ds values with attn
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_heads: int = 8
    transformer_depth: int = 1
    context_dim: int = 768
    dropout: float = 0.0
    use_remat: bool = True
    use_flash: bool = False  # Pallas flash self-attention at >=256 tokens
    # self-attn sites with N >= this use jax.nn.dot_product_attention
    # instead of the Pallas kernel (set huge to disable)
    dpa_min_tokens: int = 2048
    # fused GEGLU FeedForward kernel (ops/pallas_ff.py) — identical math,
    # ~2x less HBM traffic on TPU; plain-XLA fallback elsewhere
    use_fused_ff: bool = False
    dtype: Any = jnp.float32

    @classmethod
    def sd_v1_inpaint(cls, dtype=jnp.bfloat16, use_flash: bool = True):
        return cls(dtype=dtype, use_flash=use_flash, use_fused_ff=True)

    @classmethod
    def tiny(cls):
        """Unit-test / dryrun config: same topology, tiny widths."""
        return cls(
            model_channels=32,
            num_res_blocks=1,
            channel_mult=(1, 2),
            num_heads=4,
            context_dim=64,
            use_remat=False,
        )


class CrossAttention(nn.Module):
    """q from x, k/v from context (or x for self-attn). attn1 fusion-aware.

    Mirrors `ldm/modules/attention.py:152-222`: to_q/k/v without bias,
    to_out with bias; inner_dim = query_dim; scale = dim_head^-0.5.
    """

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dtype: Any = jnp.float32
    use_flash: bool = False
    dpa_min_tokens: int = 2048
    head_splits: Optional[Tuple[int, int]] = None  # dual-context partition; default 3:1

    @nn.compact
    def __call__(
        self,
        x,
        context=None,
        fusion: FusionConfig = NONE,
        chunks: int = 3,
        flow=None,
    ):
        inner = self.query_dim
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="to_q")(x)
        to_k = nn.Dense(inner, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="to_k")
        to_v = nn.Dense(inner, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32, name="to_v")
        if (
            context is not None
            and self.context_dim is not None
            and ctx.shape[-1] == 2 * self.context_dim
        ):
            # dual 2x768 context: CLIP/ID tokens drive the first head_splits[0]
            # heads, landmark tokens the last head_splits[1]
            # (reference attention.py:183-199)
            c1, c2 = jnp.split(ctx, 2, axis=-1)
            dh = inner // self.heads
            # reference uses heads (6, 2) of 8 — a 3:1 partition
            splits = self.head_splits or (self.heads * 3 // 4, self.heads - self.heads * 3 // 4)
            s0 = splits[0] * dh
            s1 = splits[1] * dh
            k = jnp.concatenate([to_k(c1)[..., :s0], to_k(c2)[..., inner - s1 :]], axis=-1)
            v = jnp.concatenate([to_v(c1)[..., :s0], to_v(c2)[..., inner - s1 :]], axis=-1)
        else:
            k = to_k(ctx)
            v = to_v(ctx)
        if fusion.active:
            # `flow` may be a bare flow array or a FlowPack carrying the
            # cross-window FGATS state (prev window's q/k + boundary flow)
            from vface_tpu.ops.attention import FlowPack

            if isinstance(flow, FlowPack):
                site = self.scope.path[-3] if len(self.scope.path) >= 3 else "attn"
                prev_qk = None if flow.prev is None else flow.prev.get(site)
                flow_arr, flow0, pmask = flow.flow, flow.flow0, flow.pair_mask
            else:
                prev_qk, flow_arr, flow0, pmask = None, flow, None, None
            q, k, v, carry = fuse_qkv(
                q, k, v, fusion, chunks=chunks, flow=flow_arr,
                prev_qk=prev_qk, flow0=flow0, pair_mask=pmask,
            )
            if carry is not None:
                # cross-window carry OUT — materialised only when the caller
                # applies with mutable=["fgats"] (zero cost otherwise)
                self.sow("fgats", "carry_q", carry["q"], reduce_fn=lambda a, b: b)
                self.sow("fgats", "carry_k", carry["k"], reduce_fn=lambda a, b: b)
            q = q.astype(self.dtype)
            k = k.astype(self.dtype)
            v = v.astype(self.dtype)
        to_out = nn.Dense(inner, dtype=self.dtype, param_dtype=jnp.float32, name="to_out")
        if context is not None and k.shape[1] == 1 and not fusion.active:
            # single-token context (the VFace image-conditioning operating
            # point: mapper2 emits ONE CLIP/ID token — reference ddpm.py's
            # learnable projection, and the dual 2x768 context is also one
            # token per stream): softmax over one key is exactly 1.0, so the
            # attention output equals v for every query, per head — the to_q
            # projection, scores, softmax and AV matmuls are all dead
            # compute. Bit-exact to the einsum path (1.0 * v in fp32 == v).
            # Projecting BEFORE the broadcast keeps to_out at one token too
            # (Dense is row-wise, so project-then-broadcast is bit-identical
            # to broadcast-then-project) — the [B*N, C] @ [C, C] to_out
            # matmul at every cross-attn site was the shortcut's remaining
            # dead compute.
            return jnp.broadcast_to(to_out(v), (v.shape[0], x.shape[1], inner))
        if (
            self.use_flash
            and context is None
            and x.shape[1] >= self.dpa_min_tokens
            and x.shape[0] * self.heads >= 96
        ):
            # ds1 self-attn (N=4096): XLA's fused dot_product_attention is
            # the measured winner at the SD shape on v5e AT LARGE BATCH
            # (b=12: step 119→103 ms) but collapses at small batch (b=6 pass
            # 63→165 ms — its kernel grid underutilizes below ~96 (batch ×
            # heads) programs), so it is gated on both dimensions
            # (scripts/bench_attention.py + /tmp bisects, round 2)
            b_, n_, d_ = q.shape
            dh_ = d_ // self.heads
            out = jax.nn.dot_product_attention(
                q.reshape(b_, n_, self.heads, dh_),
                k.reshape(b_, n_, self.heads, dh_),
                v.reshape(b_, n_, self.heads, dh_),
            ).reshape(b_, n_, d_)
        elif self.use_flash and context is None and x.shape[1] >= 512:
            # mid resolutions (N=512..2047): Pallas flash v5 — the
            # bf16-operand variant of v2 (fp32 casts before the dots forced
            # fp32 MXU matmuls in v1-v4; keeping bf16 operands with fp32
            # accumulation matches the einsum path's dtype discipline and
            # the MXU's native rate). Measured at ds2 (b=24, N=1024):
            # v5 2.53 ms vs v2 ~3.4 / dpa 3.82 / einsum ~5.8
            # (scripts/bench_attn_v56.py, round 3). At ds4 (N=256) the plain
            # einsum wins outright (0.99 vs v2 1.31 / v5 1.05 ms), hence the
            # 512-token floor.
            from vface_tpu.ops.pallas_attention import flash_attention_v5

            # block_q=512 measured best at the ds2 shape (b=24, N=1024):
            # 2.10 ms vs 2.20 at the 1024 default (scripts/bench_attn_v56.py r4)
            out = flash_attention_v5(q, k, v, self.heads, block_q=512)
        else:
            out = multi_head_attention(q, k, v, self.heads, dtype=self.dtype)
        return to_out(out)


class GEGLU(nn.Module):
    dim_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # exact (erf) GELU: the reference GEGLU uses F.gelu's default
        # (attention.py:37-45), not the tanh approximation
        return h * jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(h.dtype)


class _ProjParams(nn.Module):
    """Parameter holder keeping nn.Dense's ``<name>/{kernel,bias}`` tree path
    (and init) so the fused-FF path shares checkpoints with the unfused one."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


class _GEGLUParams(nn.Module):
    dim: int
    inner: int

    @nn.compact
    def __call__(self):
        return _ProjParams(self.dim, self.inner * 2, name="proj")()


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: Any = jnp.float32
    use_fused: bool = False

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        if self.use_fused:
            # single-kernel GEGLU FF (ops/pallas_ff.py): same params, same
            # math, ~2x less HBM traffic than the unfused chain on TPU
            from vface_tpu.ops.pallas_ff import geglu_ff

            wp, bp = _GEGLUParams(self.dim, inner, name="geglu")()
            wo, bo = _ProjParams(inner, self.dim, name="proj_out")()
            dt = self.dtype
            return geglu_ff(
                x.astype(dt), wp.astype(dt), bp.astype(dt), wo.astype(dt), bo.astype(dt)
            )
        h = GEGLU(inner, dtype=self.dtype, name="geglu")(x)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    """attn1 (self, injection site) → attn2 (cross to conditioning) → FF.

    `ldm/modules/attention.py:224-244`.
    """

    dim: int
    context_dim: int
    heads: int
    dtype: Any = jnp.float32
    use_flash: bool = False
    dpa_min_tokens: int = 2048
    use_fused_ff: bool = False

    @nn.compact
    def __call__(self, x, context, fusion: FusionConfig, chunks: int, flow):
        h = LayerNormF32(dtype=self.dtype, name="norm1")(x)
        x = x + CrossAttention(
            self.dim, heads=self.heads, dtype=self.dtype, use_flash=self.use_flash,
            dpa_min_tokens=self.dpa_min_tokens,
            name="attn1",
        )(h, None, fusion=fusion, chunks=chunks, flow=flow)
        h = LayerNormF32(dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(
            self.dim, self.context_dim, heads=self.heads, dtype=self.dtype, name="attn2"
        )(h, context)
        h = LayerNormF32(dtype=self.dtype, name="norm3")(x)
        return x + FeedForward(
            self.dim, dtype=self.dtype, use_fused=self.use_fused_ff, name="ff"
        )(h)


class SpatialTransformer(nn.Module):
    """GN → 1x1 proj_in → transformer blocks over HW tokens → zero 1x1 proj_out + residual.

    `ldm/modules/attention.py:246-288`.
    """

    channels: int
    context_dim: int
    heads: int
    depth: int = 1
    dtype: Any = jnp.float32
    use_flash: bool = False
    dpa_min_tokens: int = 2048
    use_fused_ff: bool = False

    @nn.compact
    def __call__(self, x, context, fusion: FusionConfig, chunks: int, flow):
        b, h, w, c = x.shape
        res = x
        x = GroupNorm32(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = Conv(self.channels, kernel=1, dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, c)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.channels, self.context_dim, self.heads, dtype=self.dtype,
                use_flash=self.use_flash, dpa_min_tokens=self.dpa_min_tokens,
                use_fused_ff=self.use_fused_ff,
                name=f"block_{i}",
            )(x, context, fusion, chunks, flow)
        x = x.reshape(b, h, w, c)
        x = Conv(self.channels, kernel=1, zero_init=True, dtype=self.dtype, name="proj_out")(x)
        return x + res


class ResBlock(nn.Module):
    """UNet residual block with timestep-embedding add (openaimodel.py:163-252).

    ``inject_chunks``: TSG conv injection (pnp_utils.py:341-383) — before the
    skip add, the residual branch of chunks 0 and 1 is replaced by chunk 2's
    (the target-reconstruction donor), copying structure into the swap path.
    """

    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, emb, inject_chunks: int = 0):
        h = GroupNorm32(dtype=self.dtype, name="in_norm")(x)
        h = nonlinearity(h)
        h = Conv(self.out_ch, dtype=self.dtype, name="in_conv")(h)
        e = Dense(self.out_ch, dtype=self.dtype, name="emb_proj")(nonlinearity(emb))
        h = h + e[:, None, None, :]
        h = GroupNorm32(dtype=self.dtype, name="out_norm")(h)
        h = nonlinearity(h)
        h = Conv(self.out_ch, zero_init=True, dtype=self.dtype, name="out_conv")(h)
        if inject_chunks:
            f = h.shape[0] // inject_chunks
            donor = h[(inject_chunks - 1) * f :]
            h = jnp.concatenate([donor] * (inject_chunks - 1) + [donor], axis=0)
        if x.shape[-1] != self.out_ch:
            x = Conv(self.out_ch, kernel=1, dtype=self.dtype, name="skip")(x)
        return x + h


class Downsample(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return Conv(self.out_ch, stride=2, dtype=self.dtype, name="op")(x)


class Upsample(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return Conv(self.out_ch, dtype=self.dtype, name="conv")(upsample_nearest_2x(x))


class UNetModel(nn.Module):
    """The 9-channel SD UNet. x: (B, H, W, 9) latent+inpaint+mask concat.

    ``injection`` is static per trace; ``flow`` is traced (F-1, Hq, Wq, 2)
    pixel flow at the 64x64 token resolution (or None).
    """

    cfg: UNetConfig = UNetConfig()

    @nn.compact
    def __call__(
        self,
        x,
        timesteps,
        context,
        flow=None,
        injection: Optional[InjectionSpec] = None,
        return_features: bool = False,
        encoder_cache=None,
        return_encoder_cache: bool = False,
    ):
        """``encoder_cache`` / ``return_encoder_cache`` implement encoder
        propagation ("Faster Diffusion", Li et al. 2023 — PAPERS.md): the
        input-block skip stack + middle activation change slowly across
        adjacent DDIM steps, so non-key steps may reuse a key step's cache
        and run only the output blocks (with the *current* timestep
        embedding). The cache is a pytree ((skips...), mid) — pass it back in
        to skip the whole encoder. Init/trace with cache=None creates all
        params; cached traces simply don't visit the encoder modules.
        """
        cfg = self.cfg
        inj = injection or InjectionSpec()
        dtype = cfg.dtype
        x = x.astype(dtype)
        context = context.astype(dtype)

        t_emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = Dense(cfg.model_channels * 4, dtype=dtype, name="time_embed_0")(t_emb.astype(dtype))
        emb = Dense(cfg.model_channels * 4, dtype=dtype, name="time_embed_2")(nonlinearity(emb))

        def res(h, e, ch, name, inject=0):
            blk = ResBlock(ch, dtype=dtype, name=name)
            if cfg.use_remat:
                return nn.remat(lambda m, a, b: m(a, b, inject))(blk, h, e)
            return blk(h, e, inject)

        def attn(h, site, ch, name):
            st = SpatialTransformer(
                ch, cfg.context_dim, cfg.num_heads, cfg.transformer_depth,
                dtype=dtype, use_flash=cfg.use_flash,
                dpa_min_tokens=cfg.dpa_min_tokens,
                use_fused_ff=cfg.use_fused_ff, name=name,
            )
            fus = inj.for_site(site)
            if cfg.use_remat:
                return nn.remat(lambda m, a, c, fl: m(a, c, fus, inj.chunks, fl))(
                    st, h, context, flow
                )
            return st(h, context, fus, inj.chunks, flow)

        ds = 1
        if encoder_cache is None:
            hs = []
            h = Conv(cfg.model_channels, dtype=dtype, name="conv_in")(x)
            hs.append(h)
            for level, mult in enumerate(cfg.channel_mult):
                ch = cfg.model_channels * mult
                for i in range(cfg.num_res_blocks):
                    h = res(h, emb, ch, f"in_{level}_{i}_res")
                    if ds in cfg.attention_resolutions:
                        h = attn(h, "in", ch, f"in_{level}_{i}_attn")
                    hs.append(h)
                if level != len(cfg.channel_mult) - 1:
                    h = Downsample(ch, dtype=dtype, name=f"in_{level}_down")(h)
                    hs.append(h)
                    ds *= 2

            ch = cfg.model_channels * cfg.channel_mult[-1]
            h = res(h, emb, ch, "mid_res_0")
            h = attn(h, "mid", ch, "mid_attn")
            h = res(h, emb, ch, "mid_res_1")
            cache_out = (tuple(hs), h)
        else:
            hs, h = list(encoder_cache[0]), encoder_cache[1]
            cache_out = encoder_cache
            for level in range(len(cfg.channel_mult) - 1):
                ds *= 2

        features = []
        to = 0  # global output_blocks index (reference numbering)
        for level in reversed(range(len(cfg.channel_mult))):
            ch = cfg.model_channels * cfg.channel_mult[level]
            for i in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                inject = inj.chunks if (inj.conv_inject and to == 3) else 0
                h = res(h, emb, ch, f"out_{level}_{i}_res", inject)
                to += 1
                if ds in cfg.attention_resolutions:
                    h = attn(h, "out", ch, f"out_{level}_{i}_attn")
                if level != 0 and i == cfg.num_res_blocks:
                    h = Upsample(ch, dtype=dtype, name=f"out_{level}_up")(h)
                    ds //= 2
                features.append(h)

        h = GroupNorm32(dtype=dtype, name="out_norm")(h)
        h = nonlinearity(h)
        out = Conv(cfg.out_channels, zero_init=True, dtype=dtype, name="out_conv")(h)
        out = out.astype(jnp.float32)
        if return_encoder_cache:
            return (out, features, cache_out) if return_features else (out, cache_out)
        if return_features:
            return out, features
        return out


class EncoderUNetModel(nn.Module):
    """Half-UNet encoder with a pooled classification/regression head.

    Capability parity with `openaimodel.py:910-1126` (``EncoderUNetModel``,
    the classifier-guidance encoder kept by the reference): the UNet's
    input_blocks + middle, followed by spatial pooling and a linear head.
    """

    cfg: UNetConfig = UNetConfig()
    out_dim: int = 1000
    pool: str = "adaptive"  # mean pool (the reference's adaptive variant)

    @nn.compact
    def __call__(self, x, timesteps, context=None):
        cfg = self.cfg
        dtype = cfg.dtype
        x = x.astype(dtype)
        t_emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = Dense(cfg.model_channels * 4, dtype=dtype, name="time_embed_0")(t_emb.astype(dtype))
        emb = Dense(cfg.model_channels * 4, dtype=dtype, name="time_embed_2")(nonlinearity(emb))

        h = Conv(cfg.model_channels, dtype=dtype, name="conv_in")(x)
        ds = 1
        for level, mult in enumerate(cfg.channel_mult):
            ch = cfg.model_channels * mult
            for i in range(cfg.num_res_blocks):
                h = ResBlock(ch, dtype=dtype, name=f"in_{level}_{i}_res")(h, emb)
            if level != len(cfg.channel_mult) - 1:
                h = Downsample(ch, dtype=dtype, name=f"in_{level}_down")(h)
                ds *= 2
        ch = cfg.model_channels * cfg.channel_mult[-1]
        h = ResBlock(ch, dtype=dtype, name="mid_res_0")(h, emb)
        h = ResBlock(ch, dtype=dtype, name="mid_res_1")(h, emb)
        h = GroupNorm32(dtype=dtype, name="out_norm")(h)
        h = nonlinearity(h)
        pooled = jnp.mean(h, axis=(1, 2))
        return Dense(self.out_dim, dtype=dtype, name="head")(pooled).astype(jnp.float32)
