"""Injection-aware attention: FSAI/TSG/FGATS as first-class functional config.

The reference implements its plug-and-play mechanisms by monkey-patching
``CrossAttention.forward`` on selected UNet blocks per sampling step
(`/root/reference/REFace/ldm/models/pnp_utils.py:57-339`). That is hostile to
XLA (stateful module mutation, per-step re-registration). Here the same math
is a *pure function* over the projected q/k/v, parameterised by a hashable
:class:`FusionConfig` that the UNet threads to its attn1 sites. Under ``jit``
each distinct config traces once; the active VFace schedule uses a single
config for all 50 steps (input-block attn1 = ``flow_fix``, everything else
off — ddim_w_inv.py:300-308).

Batch layout: frames are the batch dim; with guidance the leading axis is
``chunks * F`` with chunk order **[uncond, cond(swap), recon]** — the runtime
order of ddim_w_inv.py:654-662 (the donor for fusion is chunk 0, which holds
the *same latent* as the swap chunk but the unconditional embedding).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vface_tpu.ops import fusion as F
from vface_tpu.ops import warp as W


class FlowPack(NamedTuple):
    """Traced payload threaded through the UNet's ``flow`` argument.

    ``flow``: (F-1, Hq, Wq, 2) within-window FGATS flow (or None).
    ``prev``: {site_name: {"q": (1, N, D), "k": (1, N, D)}} — the previous
    window's last frame's post-FSAI q/k per flow site (cross-window carry,
    beyond the reference), or None.
    ``flow0``: (1, Hq, Wq, 2) boundary flow mapping this window's frame-0
    pixels back to the previous window's last frame, or None.
    ``pair_mask``: (F-1,) FGATS blend mask — 0 disables the blend at that
    consecutive-frame pair (used to pack several independent windows into
    one batched program; see ops.warp.align_by_flow).
    """

    flow: Optional[jax.Array] = None
    prev: Optional[dict] = None
    flow0: Optional[jax.Array] = None
    pair_mask: Optional[jax.Array] = None


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    """Static description of one attn1 injection site's fusion.

    mode:
      'none'       — vanilla self-attention.
      'replace'    — copy donor q/k into both other chunks (pnp_utils.py:133-143).
      'temporal'   — Gaussian frame window of donor q/k (pnp_utils.py:145-154).
      'adain'      — AdaIN(donor, branch) per chunk (pnp_utils.py:155-160).
      'mix'        — 0.5/0.5 blend (pnp_utils.py:161-166).
      'fft'        — FSAI: low-freq bins from branch, high from donor
                     (pnp_utils.py:169-183).
      'flow_fix'   — FSAI + FGATS flow warp of the swap chunk's q/k at
                     64x64-token layers (pnp_utils.py:185-234).
      'fft_vfixed' — FSAI + pin v across frames per chunk (pnp_utils.py:238-257).
    """

    mode: str = "none"
    split_ratio: float = 0.8
    flow_alpha: float = 0.8
    mix_alpha: float = 0.5
    adain_alpha: float = 0.9
    temporal_window: int = 5
    temporal_sigma: float = 1.0
    flow_tokens: int = 4096  # flow warp applies only where N == flow_tokens
    use_circulant: bool = True  # MXU circulant path for the FFT split
    # chunks==2 reference hooks plain-copy the donor (pnp_utils.py 2-chunk
    # branch). Set False to apply the configured fusion op to chunk 1 instead
    # — used by the recon-free sampler, which preserves the 3-chunk math for
    # chunks 0/1 while dropping the dead third chunk.
    two_chunk_replace: bool = True
    # trailing batch rows excluded from fusion entirely (neither donor nor
    # receiver): the pipelined pack scan folds the NEXT pack's inversion
    # sub-batch (hooks OFF during inversion, ddim_w_inv.py:389) into the same
    # UNet eval as the current pack's 2-chunk sampling batch; those rows must
    # pass through attn1 exactly as a hook-free forward would.
    bystander: int = 0
    # FRAME-SHARDED mode (the CP analog of SURVEY §7): when set, the fusion
    # runs inside a shard_map whose named axis shards the FRAME dim, and the
    # FGATS blend uses the 1-frame-halo primitive (ops.warp.align_by_flow_halo
    # — one ppermute to the left neighbour) instead of the local shift. In
    # this mode ``flow`` and ``pair_mask`` use the LEFT-PADDED per-frame
    # layout — (f_local, Hq, Wq, 2) / (f_local,), slot i = pair (prev, i),
    # global frame 0's slot dead and its mask entry 0. Cross-window carry
    # (prev_qk/flow0) is not supported here (window-parallel is the
    # production multi-chip path; this is the frame-parallel one).
    flow_axis: Optional[str] = None

    @property
    def active(self) -> bool:
        return self.mode != "none"


def _fft_combine(donor, branch, cfg: FusionConfig):
    fn = (
        F.combine_fft_high_low_circulant if cfg.use_circulant else F.combine_fft_high_low
    )
    return fn(donor, branch, cfg.split_ratio)


def fuse_qkv(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    cfg: FusionConfig,
    chunks: int = 3,
    flow: Optional[jax.Array] = None,
    prev_qk: Optional[dict] = None,
    flow0: Optional[jax.Array] = None,
    pair_mask: Optional[jax.Array] = None,
):
    """Apply the configured cross-chunk fusion to projected q/k/v (B, N, D).

    B = chunks * F. Returns (q, k, v, carry): same shapes/dtype family
    (fusion math in float32, like the reference's .float() casts); ``carry``
    is {"q", "k"} of the swap chunk's last frame post-FSAI (the cross-window
    FGATS carry) at flow sites, else None. ``prev_qk``/``flow0`` feed the
    previous window's carry into frame 0's blend (see ops.warp.align_by_flow).
    """
    if not cfg.active:
        return q, k, v, None
    if cfg.bystander:
        # split off the fusion-neutral trailing rows (the pipelined pack's
        # inversion sub-batch), fuse the rest, and reattach untouched
        by = cfg.bystander
        inner = dataclasses.replace(cfg, bystander=0)
        q0, k0, v0, carry = fuse_qkv(
            q[:-by], k[:-by], v[:-by], inner, chunks=chunks, flow=flow,
            prev_qk=prev_qk, flow0=flow0, pair_mask=pair_mask,
        )
        return (
            jnp.concatenate([q0, q[-by:].astype(q0.dtype)], axis=0),
            jnp.concatenate([k0, k[-by:].astype(k0.dtype)], axis=0),
            jnp.concatenate([v0, v[-by:].astype(v0.dtype)], axis=0),
            carry,
        )
    carry = None
    b, n, d = q.shape
    f = b // chunks
    qc = q.reshape(chunks, f, n, d)
    kc = k.reshape(chunks, f, n, d)

    def per_branch(op):
        """new chunk_i = op(donor=chunk0, branch=chunk_i) for i >= 1."""
        new_q = [qc[0]] + [op(qc[0], qc[i]) for i in range(1, chunks)]
        new_k = [kc[0]] + [op(kc[0], kc[i]) for i in range(1, chunks)]
        return jnp.stack(new_q), jnp.stack(new_k)

    if cfg.mode == "replace":
        qn = jnp.broadcast_to(qc[:1], qc.shape)
        kn = jnp.broadcast_to(kc[:1], kc.shape)
    elif cfg.mode == "temporal":
        tq = F.temporal_gaussian(qc[0], cfg.temporal_window, cfg.temporal_sigma)
        tk = F.temporal_gaussian(kc[0], cfg.temporal_window, cfg.temporal_sigma)
        qn = jnp.stack([qc[0]] + [tq] * (chunks - 1))
        kn = jnp.stack([kc[0]] + [tk] * (chunks - 1))
    elif cfg.mode == "adain":
        op = lambda d0, br: F.adain_fusion_attn(d0, br, alpha=cfg.adain_alpha)
        qn, kn = per_branch(op)
    elif cfg.mode == "mix":
        op = lambda d0, br: F.mix(d0, br, alpha=cfg.mix_alpha)
        qn, kn = per_branch(op)
    elif cfg.mode in ("fft", "flow_fix", "fft_vfixed"):
        op = lambda d0, br: _fft_combine(d0, br, cfg)
        qn, kn = per_branch(op)
        if cfg.mode == "flow_fix" and flow is not None and n == cfg.flow_tokens:
            side = int(round(n**0.5))
            # FGATS: warp only the swap chunk (index 1) across frames.
            q_sw = qn[1].reshape(f, side, side, d)
            k_sw = kn[1].reshape(f, side, side, d)
            if cfg.flow_axis is not None:
                # frame-sharded: 1-frame halo over the named axis; left-padded
                # (f,) flow/pair_mask layout (see FusionConfig.flow_axis).
                # Early return: the 2-chunk donor-copy overwrite below would
                # discard the blend anyway — forbid that combination.
                if chunks == 2 and cfg.two_chunk_replace:
                    raise ValueError(
                        "flow_axis (frame-sharded FGATS) requires the "
                        "recon-free 2-chunk semantics (two_chunk_replace="
                        "False) or 3 chunks"
                    )
                # one channel-concatenated warp for q AND k: TPU gathers are
                # index-bound, so halving the index work is ~2x on the warp
                # (bit-equal per channel; scripts/bench_warp_micro.py)
                qk = jnp.concatenate([q_sw, k_sw], axis=-1)
                qk = W.align_by_flow_halo(
                    qk, flow, cfg.flow_alpha, pair_mask, cfg.flow_axis
                )
                qn = qn.at[1].set(qk[..., :d].reshape(f, n, d))
                kn = kn.at[1].set(qk[..., d:].reshape(f, n, d))
                qcat = qn.reshape(b, n, d).astype(q.dtype)
                kcat = kn.reshape(b, n, d).astype(k.dtype)
                return qcat, kcat, v, None
            # cross-window carry OUT: last frame's post-FSAI, pre-blend q/k
            # (align_by_flow blends with the *original* previous frame,
            # temporal_flow.py:223-237 — the carry must match that semantics)
            carry = {
                "q": q_sw[-1:].reshape(1, n, d),
                "k": k_sw[-1:].reshape(1, n, d),
            }
            prev0 = f0 = None
            if prev_qk is not None and flow0 is not None:
                prev0 = jnp.concatenate(
                    [
                        prev_qk["q"].astype(jnp.float32).reshape(1, side, side, d),
                        prev_qk["k"].astype(jnp.float32).reshape(1, side, side, d),
                    ],
                    axis=-1,
                )
                f0 = flow0
            # one channel-concatenated warp for q AND k: TPU gathers are
            # index-bound, so halving the index work is ~2x on the warp cost
            # (bit-equal per channel — the blend is channelwise linear;
            # scripts/bench_warp_micro.py: stacked 5.81 → four-gather 4.42 ms
            # per (11, 64, 64, 320) warp, and q+k share one index set here).
            # Stays fp32: a bf16-operand gather was measured CATASTROPHIC
            # (994 vs 182 ms/step, scripts/bench_sample_scan.py — XLA lowers
            # the 2-byte-element gather poorly), so the bandwidth saving is
            # not reachable that way.
            qk = jnp.concatenate([q_sw, k_sw], axis=-1)
            qk = W.align_by_flow(qk, flow, cfg.flow_alpha, prev0, f0, pair_mask)
            qn = qn.at[1].set(qk[..., :d].reshape(f, n, d))
            kn = kn.at[1].set(qk[..., d:].reshape(f, n, d))
        if cfg.mode == "fft_vfixed":
            vc = v.reshape(chunks, f, n, d)
            pin = lambda ch: jnp.broadcast_to(ch[:1], ch.shape)
            vn = jnp.stack([vc[0]] + [pin(vc[i]) for i in range(1, chunks)])
            v = vn.reshape(b, n, d).astype(v.dtype)
    else:
        raise ValueError(f"unknown fusion mode {cfg.mode!r}")

    if chunks == 2 and cfg.mode != "none" and cfg.two_chunk_replace:
        # 2-chunk semantics (pnp_utils.py:259-266): plain donor copy.
        qn = jnp.broadcast_to(qc[:1], qc.shape)
        kn = jnp.broadcast_to(kc[:1], kc.shape)
        carry = None

    q = qn.reshape(b, n, d).astype(q.dtype)
    k = kn.reshape(b, n, d).astype(k.dtype)
    return q, k, v, carry


def multi_head_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, num_heads: int, dtype=jnp.float32,
    bias: jax.Array | None = None,
):
    """Standard softmax attention over (B, N, D) with D = num_heads * d_head.

    Expressed as batched einsums; XLA fuses scale+softmax and tiles the matmuls
    onto the MXU. The softmax runs in float32 for stability regardless of the
    compute dtype. ``bias``: optional additive fp32 logit bias broadcastable to
    (B, H, Nq, Nk) — used for causal/padding masks (e.g. the CLIP text tower).
    """
    b, nq, d = q.shape
    nk = k.shape[1]
    h = num_heads
    dh = d // h
    scale = dh**-0.5
    qh = q.reshape(b, nq, h, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, nk, h, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, nk, h, dh).transpose(0, 2, 1, 3)
    sim = jnp.einsum("bhid,bhjd->bhij", qh, kh, preferred_element_type=jnp.float32)
    sim = sim.astype(jnp.float32) * scale
    if bias is not None:
        sim = sim + bias.astype(jnp.float32)
    attn = jax.nn.softmax(sim, axis=-1).astype(dtype)
    out = jnp.einsum("bhij,bhjd->bhid", attn, vh, preferred_element_type=jnp.float32)
    return out.astype(dtype).transpose(0, 2, 1, 3).reshape(b, nq, d)
