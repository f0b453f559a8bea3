"""Flow warping (FGATS) — bilinear grid sampling and frame alignment, NHWC.

Re-derivation of `/root/reference/REFace/scripts/temporal_flow.py:40-53,223-237`:

* ``grid_sample``   — torch.nn.functional.grid_sample(align_corners=True,
  padding_mode='border') semantics, NHWC, fully vectorised gathers.
* ``warp_by_flow``  — sample `img` at (grid + flow); flow in *pixel* units with
  channels (dx, dy), so warp_by_flow(frame_i, flow_i→) realigns frame i to
  frame i+1's geometry.
* ``align_by_flow`` — the FGATS blend. NOTE: the reference's active path
  (temporal_flow.py:223-237) blends each frame with the warp of the *original*
  previous frame (``x_prev`` is never written in the loop), i.e. it is NOT a
  recurrence:  out[i+1] = alpha * x[i+1] + (1-alpha) * warp(x[i], flow[i]),
  out[0] = x[0]. That makes it embarrassingly parallel across frames — a
  perfect fit for frames-as-batch sharding. ``align_by_flow_chain`` provides
  the recurrent variant (used by batch_flow_align, temporal_flow.py:116-161)
  via lax.scan for completeness.

Flow resolution: the reference computes RAFT flow at 512² and hands it
unscaled to 64×64 q/k warps (the 64-res resize at
`scripts/VFace_inference_batch.py:556` is commented out, which would fault at
runtime in torch). We define the contract properly: ``resize_flow`` rescales a
flow field to the target grid *and* rescales its displacement magnitudes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(img: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear sample `img` (B, H, W, C) at absolute pixel coords (B, Ho, Wo, 2).

    coords[..., 0] = x (width index), coords[..., 1] = y (height index);
    align_corners=True + border clamping (matches the reference's grid_sample
    call after unnormalising its [-1, 1] grid).
    """
    b, h, w, c = img.shape
    # Border clamping applied to the COORDS (torch border semantics: the
    # sample position is clamped into the image, then interpolated). The
    # previous formulation clamped each tap index instead; the two agree
    # everywhere (identically in-range, to 1 ulp at out-of-range coords where
    # both reduce to the edge pixel).
    x = jnp.clip(coords[..., 0].astype(jnp.float32), 0, w - 1)
    y = jnp.clip(coords[..., 1].astype(jnp.float32), 0, h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    if c <= 16:
        # SMALL C (images, masks): TPU gathers are index-bound, not
        # byte-bound — ONE take_along_axis over an edge-replicated 4-tap
        # channel stack (C → 4C) replaces four separate gathers. Measured
        # 520 → ~180 ms on the 24-frame paste-back
        # (scripts/bench_glue_micro.py). Edge replication reproduces the
        # clamped x0+1 / y0+1 taps exactly (x0 ∈ [0, w-1] after the clamp
        # above, and the +1 taps only carry nonzero weight when in range).
        right = jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
        down = jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
        downright = jnp.concatenate([right[:, 1:], right[:, -1:]], axis=1)
        stack = jnp.concatenate([img, right, down, downright], axis=-1)
        flat = stack.reshape(b, h * w, 4 * c)
        idx = (y0.astype(jnp.int32) * w + x0.astype(jnp.int32)).reshape(b, -1, 1)
        g = jnp.take_along_axis(flat, idx, axis=1).reshape(x.shape + (4 * c,))
        v00, v01 = g[..., :c], g[..., c : 2 * c]
        v10, v11 = g[..., 2 * c : 3 * c], g[..., 3 * c :]
    else:
        # WIDE C (FGATS q/k at 320..1280): the 4-tap stack quadruples the
        # row payload (materialise + re-read 4C rows) and loses — four
        # row-gathers at C are 24% faster at (11, 64, 64, 320)
        # (scripts/bench_warp_micro.py: 5.81 → 4.42 ms). Bit-identical
        # taps: clamped +1 indices == edge replication.
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        x1i = jnp.minimum(x0i + 1, w - 1)
        y1i = jnp.minimum(y0i + 1, h - 1)
        flat = img.reshape(b, h * w, c)

        def take(yy, xx):
            idx = (yy * w + xx).reshape(b, -1, 1)
            return jnp.take_along_axis(flat, idx, axis=1).reshape(x.shape + (c,))

        v00, v01 = take(y0i, x0i), take(y0i, x1i)
        v10, v11 = take(y1i, x0i), take(y1i, x1i)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return (top * (1 - wy) + bot * wy).astype(img.dtype)


def warp_by_flow(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Warp `img` (B, H, W, C) by `flow` (B, H, W, 2) in pixel units (dx, dy)."""
    b, h, w, _ = flow.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )
    base = jnp.stack([xs, ys], axis=-1)[None]  # (1, H, W, 2)
    return grid_sample(img, base + flow)


def resize_flow(flow: jax.Array, height: int, width: int) -> jax.Array:
    """Bilinearly resize a flow field and rescale displacement magnitudes."""
    b, h, w, _ = flow.shape
    out = jax.image.resize(flow, (b, height, width, 2), method="bilinear")
    scale = jnp.asarray([width / w, height / h], dtype=flow.dtype)
    return out * scale


def align_by_flow(
    x: jax.Array,
    flow: jax.Array,
    alpha: float = 0.8,
    prev0: jax.Array = None,
    flow0: jax.Array = None,
    pair_mask: jax.Array = None,
) -> jax.Array:
    """FGATS parallel alignment over the frame (batch) axis.

    x: (F, H, W, C) frames; flow: (F-1, H, W, 2) with flow[i] mapping frame
    i+1 pixels back to frame i. Returns out with out[0] = x[0] and
    out[i+1] = alpha * x[i+1] + (1-alpha) * warp(x[i], flow[i]).

    ``prev0``/``flow0`` (both (1, H, W, ·)) extend the chain ACROSS window
    boundaries — beyond the reference, whose windows are smoothed
    independently (SURVEY §5): frame 0 then blends with the warp of the
    previous window's last frame instead of passing through unchanged.

    ``pair_mask`` (F-1,) disables the blend for selected pairs (mask 0 →
    out[i+1] = x[i+1]). This lets several independent windows ride ONE
    batched program: concatenate their frames and zero the mask at window
    boundaries — bit-equal to separate windows, better MXU utilisation.
    """
    warped_prev = warp_by_flow(x[:-1], flow)  # (F-1, H, W, C)
    blended = alpha * x[1:] + (1.0 - alpha) * warped_prev
    if pair_mask is not None:
        m = pair_mask.astype(blended.dtype)[:, None, None, None]
        blended = m * blended + (1.0 - m) * x[1:]
    if prev0 is not None and flow0 is not None:
        w0 = warp_by_flow(prev0.astype(x.dtype), flow0)
        first = (alpha * x[:1] + (1.0 - alpha) * w0).astype(x.dtype)
    else:
        first = x[:1]
    return jnp.concatenate([first, blended.astype(x.dtype)], axis=0)


def align_by_flow_halo(
    x: jax.Array,
    flow: jax.Array,
    alpha: float = 0.8,
    pair_mask: jax.Array = None,
    axis_name: str = "data",
) -> jax.Array:
    """:func:`align_by_flow` for a FRAME-SHARDED batch — inside ``shard_map``.

    The CP analog of SURVEY §7: frames are sharded over ``axis_name``; the
    only cross-frame dependency (the FGATS blend with the previous frame,
    `scripts/temporal_flow.py:223-237`) needs a 1-frame halo, fetched from
    the left neighbour with ONE ``ppermute`` instead of all-gathering the
    window.

    Per-shard view (f_local = F / n_shards):
      x:    (f_local, H, W, C)
      flow: (f_local, H, W, 2) — LEFT-PADDED convention: flow[i] maps local
            frame i's pixels back to the previous GLOBAL frame, so the
            shard-boundary pair rides slot 0 (global frame 0's slot is dead).
      pair_mask: (f_local,) per-FRAME blend mask (same left-padded layout);
            the caller MUST zero the global frame 0 entry — that is what
            makes the first frame pass through unchanged (instead of the
            axis_index check, so window packing keeps working unchanged).

    out[i] = m[i]·(alpha·x[i] + (1−alpha)·warp(prev(i), flow[i])) +
             (1−m[i])·x[i],  with prev(local 0) = left neighbour's last frame.
    """
    from jax.lax import ppermute

    n = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    halo = ppermute(x[-1], axis_name, perm)  # left neighbour's last frame
    prev = jnp.concatenate([halo[None], x[:-1]], axis=0)
    warped = warp_by_flow(prev.astype(x.dtype), flow)
    blended = alpha * x + (1.0 - alpha) * warped
    if pair_mask is None:
        # no mask given: still force global frame 0 to identity
        idx = jax.lax.axis_index(axis_name)
        is_first = (jnp.arange(x.shape[0]) == 0) & (idx == 0)
        m = 1.0 - is_first.astype(blended.dtype)
    else:
        m = pair_mask.astype(blended.dtype)
    m = m[:, None, None, None]
    return (m * blended + (1.0 - m) * x).astype(x.dtype)


def align_by_flow_chain(x: jax.Array, flow: jax.Array, alpha: float = 0.5) -> jax.Array:
    """Recurrent variant: out[i+1] = alpha*x[i+1] + (1-alpha)*warp(out[i], flow[i]).

    Sequential over frames (window <= 8 in practice) via lax.scan; mirrors the
    in-place update chain of batch_flow_align (temporal_flow.py:131-145).
    """

    def step(prev, inp):
        xi, fi = inp
        warped = warp_by_flow(prev[None], fi[None])[0]
        out = alpha * xi + (1.0 - alpha) * warped
        return out, out

    _, rest = jax.lax.scan(step, x[0], (x[1:], flow))
    return jnp.concatenate([x[:1], rest], axis=0)


def align_by_flow_high_res(
    x_latent: jax.Array,
    flow: jax.Array,
    decode_fn,
    encode_fn,
    alpha: float = 0.5,
) -> jax.Array:
    """Pixel-space FGATS variant (temporal_flow.py:191-219): decode the
    latents, blend each frame with the warp of the previous *decoded* frame,
    re-encode. flow at the decoded resolution, (F-1, H, W, 2)."""
    imgs = decode_fn(x_latent)  # (F, H, W, 3)
    warped_prev = warp_by_flow(imgs[:-1], flow)
    blended = alpha * imgs[1:] + (1.0 - alpha) * warped_prev
    out = jnp.concatenate([imgs[:1], blended], axis=0)
    return encode_fn(out)


def batch_flow_align(
    x_prev: jax.Array,
    flow: jax.Array,
    decode_fn,
    encode_fn,
    alpha: float = 0.0,
) -> jax.Array:
    """Recurrent pixel-space chain (temporal_flow.py:116-161): decode, then
    out[i+1] = alpha*img[i+1] + (1-alpha)*warp(out[i]); re-encode."""
    imgs = decode_fn(x_prev)
    aligned = align_by_flow_chain(imgs, flow, alpha)
    return encode_fn(aligned)


def batch_flow_align_latent(x_prev: jax.Array, flow_latent: jax.Array, alpha: float = 0.0) -> jax.Array:
    """Latent-space recurrent chain (temporal_flow.py:278-320): the same
    blend chain applied directly to latents with flow at latent resolution."""
    return align_by_flow_chain(x_prev, flow_latent, alpha)


def warp_from_video(frames: jax.Array, flows: jax.Array) -> jax.Array:
    """Propagate frame 0 through the flow chain (temporal_flow.py:242-274):
    out[0] = frames[0]; out[i+1] = warp(out[i], flows[i])."""

    def step(prev, fi):
        nxt = warp_by_flow(prev[None], fi[None])[0]
        return nxt, nxt

    _, rest = jax.lax.scan(step, frames[0], flows)
    return jnp.concatenate([frames[:1], rest], axis=0)
