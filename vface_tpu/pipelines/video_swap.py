"""The VFace video face-swap pipeline — end-to-end, window-batched, jitted.

Capability parity with `/root/reference/REFace/scripts/VFace_inference_batch.py`
(``run_inference`` :193-670) and ``VFace_inference_single.py``, restructured so
that everything between frame ingest and paste-back is device code:

reference (per 6-frame window)                 → here
----------------------------------------------------------------------------
dlib align/crop per frame on host (:277-309)   → LandmarkNet + quad_crop, batched
BiSeNet mask per frame (:251, :287)            → BiSeNet, batched
model.get_landmarks dlib CPU loop (:429)       → LandmarkNet on the crop batch
conditioning_with_feat ×3 (:437-442, :503)     → `window_conditionings`
VAE encodes (:456-513)                         → batched encodes
ddim_invert + per-step torch.save (:531-541)   → in-HBM latent stack scan
RAFT flow pair loop (:553)                     → batched RAFT forward
sampler.sample 3-chunk 50 steps (:580-594)     → `vface_sample` scan
decode + background re-encode trick (:611-623) → `decode_with_background`
PIL PERSPECTIVE paste-back (:625-636)          → `preprocess.align.paste_back`
moviepy mux (:646-666)                         → `vface_tpu.io.video`

Window semantics preserved: each window of ``n_frames`` (default 6) is
smoothed independently; the window's start codes are the inversion latents at
t=961 (:541); FGATS flow links consecutive frames inside the window only.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vface_tpu.models.clip import clip_preprocess
from vface_tpu.models.ldm import VFaceModel
from vface_tpu.models.unet import InjectionSpec
from vface_tpu.ops.attention import FusionConfig
from vface_tpu.ops.warp import resize_flow
from vface_tpu.preprocess.align import compute_quad, perspective_coefficients, quad_crop, paste_back
from vface_tpu.preprocess.landmarks import LandmarkNet, landmarks_to_vector
from vface_tpu.preprocess.masks import inpaint_inputs
from vface_tpu.samplers.inversion import ddim_invert
from vface_tpu.samplers.vface import vface_sample


@dataclasses.dataclass(frozen=True)
class SwapOptions:
    """Operating point of VFace_video_swap_batch.sh / VFace_inference_batch.py."""

    ddim_steps: int = 50
    inversion_steps: int = 50  # fixed 50 regardless of ddim_steps (:502)
    cfg_scale: float = 3.0
    window: int = 6  # frames per batch (:783-787)
    image_size: int = 512
    parser_size: int = 512  # BiSeNet input resolution (face_parsing_demo.py)
    eta: float = 0.0
    split_ratio: float = 0.8
    flow_alpha: float = 0.8
    fps: int = 10
    # literal reference inversion batch (co-inverted source is dead compute;
    # see _swap_window_impl) — off by default for 2x cheaper inversion
    co_invert_source: bool = False
    # literal reference 3-chunk sampling batch (the TSG recon chunk is inert
    # in the active runtime; dropping it is bit-identical — see
    # vface_tpu.samplers.vface) — off by default for 1/3 cheaper sampling
    keep_recon_chunk: bool = False
    # encoder propagation interval for the sampling loop (1 = exact)
    encoder_interval: int = 1
    # cross-window FGATS carry (beyond the reference): warp the previous
    # window's last-frame attention q/k into the next window's first frame,
    # removing the window-boundary temporal seam (SURVEY §5). Sequential
    # windows only (the sharded path keeps windows independent).
    # EXPERIMENTAL: the mechanism is correct and pinned by tests
    # (within-window invariance, boundary-only effect), but its *benefit* is
    # only measurable with trained weights — at random weights the boundary
    # delta is below noise (PLAN.md round-3 carry table). Until real
    # checkpoints exist, treat as a research flag, not a production default.
    cross_window_carry: bool = False
    # pack this many consecutive windows into ONE device program (frames
    # concatenated; FGATS blends masked at window boundaries so the output
    # is bit-equal to separate windows). Raises the UNet batch (6→12→24…)
    # for better MXU utilisation on one chip — pure throughput engineering.
    batch_windows: int = 1
    # token count at which FGATS flow warping applies (4096 = the 64x64
    # attention grid at 512px, pnp_utils.py:185-234; tiny tests lower it)
    flow_tokens: int = 4096
    # software-pipeline consecutive packs: pack i+1's DDIM inversion rides the
    # same UNet evals as pack i's 2-chunk sampling (fusion-neutral bystander
    # rows — see samplers.vface.vface_sample_pipelined). Output-exact; pays
    # the per-eval fixed cost once per step instead of twice. Requires the
    # recon-free exact operating point (keep_recon_chunk=False,
    # encoder_interval=1, no cross_window_carry) and a fresh (non-resumed)
    # run; the driver falls back to the sequential loop otherwise.
    # MEASURED NEUTRAL on v5e (scripts/bench_batch_scaling.py: the b=3F eval
    # costs slightly MORE than the 2F + F evals it replaces — the per-eval
    # batch landscape is jagged, with b=24 the per-row sweet spot), so it is
    # off by default; kept for hardware where the landscape differs.
    pipeline_packs: bool = False
    # invert this many packs per inversion program. The measured v5e per-row
    # eval costs (scripts/bench_batch_scaling.py: b=12 8.00, b=24 7.08
    # ms/row) make the 1-chunk inversion the worst-batched stage at
    # batch_windows=2; pairing two packs' inversions into one b=2F scan runs
    # every UNet eval at the b=24 sweet spot (sampling is already there).
    # Output-exact (batch elements are independent; hooks are off during
    # inversion); same eligibility/fallback rules as pipeline_packs.
    invert_packs: int = 1
    # with invert_packs == 2: run the two packs' SAMPLING scans merged as one
    # b=4F eval too (one 2-chunk CFG batch over both packs, FGATS pair-masked
    # at the pack boundary like window boundaries) instead of two b=2F scans.
    # Output-exact for the same reason window packing is (align_by_flow is
    # per-pair, batch elements otherwise independent); worth it only where
    # the measured per-row eval cost keeps falling past b=2F.
    # MEASURED UNFAVORABLE on v5e (scripts/bench_batch_scaling.py round 3:
    # 7.09 ms/row at b=24 vs 7.24 at b=48 and 7.30 at b=72 — b=24 is the
    # per-row sweet spot), so off by default; kept for hardware with a
    # different batch landscape, exactness pinned by
    # test_superpack_merged_sampling_matches_sequential.
    merge_sampling: bool = False
    # ---- approx-track levers (quality-bounded; the EXACT headline never
    # sets them — bench.py reports the approx composition separately with
    # each lever's measured bound) ----
    # RAFT GRU iterations. The reference pins 20 (torchvision raft_large
    # default, temporal_flow.py:164-188); 8 keeps flow EPE small on face
    # video (bound measured in scripts/bench_approx_levers.py) at
    # ~0.06 ms/frame-pair-pixel less work (4.91 ms/iter, PLAN r4).
    raft_iters: int = 20
    # Background-consistency trick resolution. 0 = full-res (exact,
    # :611-623); e.g. 256 runs the encode+decode roundtrip at 256² and
    # bilinearly upsamples — only non-face background pixels are affected
    # (the swapped face region comes from the sampling decode either way).
    background_res: int = 0


class VideoSwapPipeline:
    """Bundles the diffusion model with the aux nets and exposes window ops.

    ``aux_params`` carries {"bisenet": ..., "raft": ..., "landmark": ...}.
    BiSeNet / RAFT / landmark modules are constructed here; masks/landmarks/
    flow can also be supplied precomputed (the reference caches them on disk,
    :268-309 — our resume story keeps that shape).
    """

    def __init__(self, model: VFaceModel, opts: SwapOptions = SwapOptions()):
        from vface_tpu.models.bisenet import BiSeNet
        from vface_tpu.models.raft import RAFT

        self.model = model
        self.opts = opts
        self.bisenet = BiSeNet()
        from vface_tpu.models.raft import RAFTConfig

        self.raft = RAFT(RAFTConfig(iters=opts.raft_iters))
        self.landmark_net = LandmarkNet()
        self.injection = InjectionSpec(
            input_blocks=FusionConfig(
                "flow_fix", split_ratio=opts.split_ratio, flow_alpha=opts.flow_alpha,
                flow_tokens=opts.flow_tokens,
            ),
            chunks=3,
        )
        # the whole window (encode → co-invert → 3-chunk sample → decode) is
        # ONE jitted program per (window, flow-presence) signature — replacing
        # the reference's eager per-op dispatch + disk round trips
        self._window_jit = jax.jit(
            self._swap_window_impl, static_argnames=("has_flow", "return_fgats")
        )
        # window + background re-encode trick + perspective paste-back fused
        # into the same program (three dispatches → one; the background VAE
        # round-trip overlaps the sampler's tail instead of serialising)
        self._window_pasted_jit = jax.jit(
            self._swap_window_pasted_impl, static_argnames=("has_flow", "return_fgats")
        )
        # W independent windows at once, vmapped over the window axis; params
        # ride as a jitted argument (replicated on a mesh) so the program is
        # cached once, not re-traced per call
        self._windows_jit = jax.jit(self._swap_windows_batched_impl)
        # pipelined-pack programs (opts.pipeline_packs): prologue inversion,
        # steady-state fused sampling+next-inversion, and the final
        # sampling-only pack
        self._invert_pack_jit = jax.jit(self._invert_pack_impl)
        self._pipe_step_jit = jax.jit(
            self._pipelined_step_impl, static_argnames=("has_flow",)
        )
        self._final_pack_jit = jax.jit(
            self._final_pack_impl, static_argnames=("has_flow",)
        )
        # super-pack program (opts.invert_packs == 2): two packs' inversions
        # in one b=2F scan, then two b=2F sampling scans (2 chunks x F each)
        self._superpack_jit = jax.jit(
            self._superpack_impl, static_argnames=("has_flow",)
        )
        # aux stages are jitted too: on the tunneled backend every eager op is
        # a round trip, and the unjitted CLIP/RAFT aux paths measured 14.4 s /
        # 3.5 s per window of pure dispatch overhead (scripts/bench_e2e_phases)
        # frame-sharded epilogue (swap_video_frames_frame_sharded)
        self._fs_post_jit = jax.jit(self._fs_post_impl)
        self._lm_jit = jax.jit(
            lambda a, x: self.landmark_net.apply({"params": a["landmark"]}, x)
        )
        self._flow_jit = jax.jit(self._compute_flow_impl)
        self._cond_jit = jax.jit(self._window_conditionings_impl)
        self._parse_jit = jax.jit(self._parse_masks_impl)

    # ---------------------------------------------------------------- prep
    def detect_landmarks(self, aux_params, images01: jax.Array) -> jax.Array:
        return self._lm_jit(aux_params, images01)

    def align_begin(self, aux_params, frames01: jax.Array, scale: float = 1.0,
                    landmarks: Optional[jax.Array] = None):
        """Device stage of the alignment: landmark detect + quad compute.
        Returns (quad, qsize) DEVICE arrays — dispatch this EARLY so the
        small programs run (and their results become fetchable) while a big
        program occupies the queue behind them (the streaming overlap in
        `_swap_frames_superpacked_streaming`)."""
        lm = landmarks if landmarks is not None else self.detect_landmarks(aux_params, frames01)
        return compute_quad(lm, scale=scale)

    def align_finish(self, frames01: jax.Array, quad, qsize,
                     prev_quad: Optional[np.ndarray] = None):
        """Host+device tail of the alignment: degenerate-quad fallback (host),
        quad crop (device), inverse-perspective solve (host). ``prev_quad``
        carries the fallback chain across streamed chunk boundaries (bit-equal
        to whole-clip alignment). Returns (crops01, inv_coeffs, last_quad)."""
        s = self.opts.image_size
        # detection-failure fallback (VFace_inference_batch.py:297-304): a
        # degenerate quad (near-zero extent) reuses the previous frame's quad;
        # frame 0 falls back to a centred crop of the full frame.
        quad_np_all = np.array(quad)  # writable copy
        qs = np.asarray(qsize)
        h_img, w_img = frames01.shape[1], frames01.shape[2]
        min_q = 0.02 * min(h_img, w_img)
        fallback = np.asarray(
            [[0.0, 0.0], [0.0, h_img - 1.0], [w_img - 1.0, h_img - 1.0], [w_img - 1.0, 0.0]],
            np.float32,
        )
        prev = fallback if prev_quad is None else prev_quad
        for i in range(quad_np_all.shape[0]):
            if qs[i] < min_q or not np.isfinite(quad_np_all[i]).all():
                quad_np_all[i] = prev
            else:
                prev = quad_np_all[i]
        crops = quad_crop(frames01, jnp.asarray(quad_np_all), s)
        # inverse transform: frame pixel → crop pixel, per frame (host solve)
        coeffs = np.stack(
            [
                perspective_coefficients(
                    # crop corners ↔ quad corners: map frame→crop coords
                    quad_np_all[i],
                    np.asarray([[0, 0], [0, s], [s, s], [s, 0]], np.float32),
                )
                for i in range(quad_np_all.shape[0])
            ]
        )
        return crops, jnp.asarray(coeffs), prev

    def align_crops(self, aux_params, frames01: jax.Array, scale: float = 1.0,
                    landmarks: Optional[jax.Array] = None):
        """frames01 (F, H, W, 3) in [0,1] → (crops01 (F,S,S,3), inv_coeffs (F,8)).

        quad via landmarks (alignmengt.py:148-178), crop via the batched QUAD
        transform, inverse perspective coefficients for paste-back.
        ``landmarks`` (F, 68, 2) overrides detection (multi-face localisation).
        """
        quad, qsize = self.align_begin(aux_params, frames01, scale, landmarks)
        crops, coeffs, _ = self.align_finish(frames01, quad, qsize)
        return crops, coeffs

    def parse_masks(self, aux_params, crops01: jax.Array) -> jax.Array:
        return self._parse_jit(aux_params, crops01)

    def _parse_masks_impl(self, aux_params, crops01: jax.Array) -> jax.Array:
        """Class map at the crop resolution (BiSeNet runs at its native 512²,
        face_parsing_demo.py:297; the map is nearest-resized back to the crop)."""
        from vface_tpu.models.bisenet import parse_faces

        seg = parse_faces(
            aux_params["bisenet"], crops01, self.bisenet, size=self.opts.parser_size
        )
        f, s = crops01.shape[0], crops01.shape[1]
        if seg.shape[1] != s:
            seg = jax.image.resize(seg, (f, s, s), method="nearest")
        return seg

    def compute_flow(self, aux_params, crops01: jax.Array) -> jax.Array:
        return self._flow_jit(aux_params, crops01)

    def compute_flow_superpack(self, aux_params, crops01: jax.Array) -> jax.Array:
        """Flow for the 2-pack super-pack program, computed per pack.

        The cross-pack boundary pair is never consumed (each sampling half
        slices only its own F-1 pairs), so running the standard single-pack
        flow program twice halves RAFT's peak HBM, reuses the already-compiled
        program, and skips the dead pair — the boundary slot is zero-filled to
        keep the (2F-1, S, S, 2) signature."""
        f = crops01.shape[0] // 2
        fa = self.compute_flow(aux_params, crops01[:f])
        fb = self.compute_flow(aux_params, crops01[f:])
        return jnp.concatenate([fa, jnp.zeros_like(fa[:1]), fb], axis=0)

    def _compute_flow_impl(self, aux_params, crops01: jax.Array) -> jax.Array:
        """(F, S, S, 3) → (F-1, S, S, 2): RAFT flow between consecutive frames
        (temporal_flow.py:164-188), all pairs in one batched forward.

        Direction contract: the reference calls ``compute_flow(frame2, frame1)``
        (temporal_flow.py:183), i.e. RAFT(frame_{i+1}, frame_i) — **backward**
        flow living on frame i+1's grid, mapping each of its pixels to the
        matching pixel of frame i. `ops.warp.align_by_flow` then samples the
        previous frame at ``grid + flow`` (temporal_flow.py:40-50), so flow[i]
        must be RAFT(x[i+1], x[i]); the argument order here is load-bearing.
        """
        x = crops01 * 2.0 - 1.0
        return self.raft.apply({"params": aux_params["raft"]}, x[1:], x[:-1])

    # ------------------------------------------------------- conditionings
    def window_conditionings(self, params, aux_params, *args):
        return self._cond_jit(params, aux_params, *args)

    def _window_conditionings_impl(
        self,
        params,
        aux_params,
        crops: jax.Array,          # (F,S,S,3) target crops in [-1,1]
        keep_mask: jax.Array,      # (F,S,S,1) 1 = background kept
        src_clip: jax.Array,       # (1,224,224,3) CLIP-normalised masked source
        src_crop01: jax.Array,     # (1,S,S,3) aligned source in [0,1]
        src_landmarks: jax.Array,  # (1,136)
    ):
        """Build (cond, uncond, inverse_cond, cond_w_src) for a window
        (VFace_inference_batch.py:429-506)."""
        f = crops.shape[0]
        crops01 = (crops + 1.0) * 0.5
        lm = landmarks_to_vector(self.detect_landmarks(aux_params, crops01))
        tar_clip = clip_preprocess(crops01, self.model.cfg.cond.clip.image_size)
        src_clip_f = jnp.broadcast_to(src_clip, (f,) + src_clip.shape[1:])
        src_face01 = jnp.broadcast_to(src_crop01, (f,) + src_crop01.shape[1:])
        # swap cond: CLIP(source) + CLIP(target frame) + ID(source) + lm(target)
        cond = self.model.conditioning(params, src_clip_f, lm, tar_clip, src_face01)
        # inversion cond: CLIP(masked target bg) + CLIP(target) + ID(bg) + lm(target)
        bg01 = crops01 * keep_mask
        bg_clip = clip_preprocess(bg01, self.model.cfg.cond.clip.image_size)
        inverse_cond = self.model.conditioning(params, bg_clip, lm, tar_clip, bg01)
        # source-reconstruction cond (for the co-inverted source chunk)
        src_lm = src_landmarks
        src_tar_clip = clip_preprocess(src_crop01, self.model.cfg.cond.clip.image_size)
        cond_w_src = self.model.conditioning(params, src_clip, src_lm, src_tar_clip, src_crop01)
        cond_w_src = jnp.broadcast_to(cond_w_src, (f,) + cond_w_src.shape[1:])
        uncond = self.model.uncond(params, f)
        return cond, uncond, inverse_cond, cond_w_src

    # ------------------------------------------------------------- window
    def swap_window(
        self,
        params,
        crops: jax.Array,          # (F,S,S,3) target crops [-1,1]
        keep_mask: jax.Array,      # (F,S,S,1)
        cond: jax.Array,
        uncond: jax.Array,
        inverse_cond: jax.Array,
        cond_w_src: jax.Array,
        src_crop: jax.Array,       # (1,S,S,3) source [-1,1]
        src_keep_mask: jax.Array,  # (1,S,S,1)
        flow: Optional[jax.Array] = None,
        fgats_prev: Optional[dict] = None,
        fgats_flow0: Optional[jax.Array] = None,
        return_fgats: bool = False,
        pair_mask: Optional[jax.Array] = None,
    ):
        """One jitted program per window signature (see __init__)."""
        return self._window_jit(
            params, crops, keep_mask, cond, uncond, inverse_cond, cond_w_src,
            src_crop, src_keep_mask,
            flow if flow is not None else jnp.zeros((0,) + crops.shape[1:3] + (2,)),
            fgats_prev,
            fgats_flow0,
            pair_mask,
            has_flow=flow is not None,
            return_fgats=return_fgats,
        )

    def swap_window_pasted(
        self,
        params,
        frames01_w: jax.Array,     # (F,H,W,3) original frames [0,1]
        inv_coeffs_w: jax.Array,   # (F,8) frame→crop perspective coeffs
        crops: jax.Array,
        keep_mask: jax.Array,
        cond: jax.Array,
        uncond: jax.Array,
        inverse_cond: jax.Array,
        cond_w_src: jax.Array,
        src_crop: jax.Array,
        src_keep_mask: jax.Array,
        flow: Optional[jax.Array] = None,
        fgats_prev: Optional[dict] = None,
        fgats_flow0: Optional[jax.Array] = None,
        return_fgats: bool = False,
        pair_mask: Optional[jax.Array] = None,
    ):
        """swap_window + background trick + paste-back as ONE program."""
        return self._window_pasted_jit(
            params, frames01_w, inv_coeffs_w, crops, keep_mask,
            cond, uncond, inverse_cond, cond_w_src, src_crop, src_keep_mask,
            flow if flow is not None else jnp.zeros((0,) + crops.shape[1:3] + (2,)),
            fgats_prev,
            fgats_flow0,
            pair_mask,
            has_flow=flow is not None,
            return_fgats=return_fgats,
        )

    def _swap_window_impl(
        self,
        params,
        crops: jax.Array,
        keep_mask: jax.Array,
        cond: jax.Array,
        uncond: jax.Array,
        inverse_cond: jax.Array,
        cond_w_src: jax.Array,
        src_crop: jax.Array,
        src_keep_mask: jax.Array,
        flow: jax.Array,
        fgats_prev: Optional[dict] = None,
        fgats_flow0: Optional[jax.Array] = None,
        pair_mask: Optional[jax.Array] = None,
        has_flow: bool = False,
        return_fgats: bool = False,
    ):
        """Device core for one window → swapped crops (F,S,S,3) in [0,1].

        Mirrors :456-623: encode → co-invert target+source → 3-chunk hooked
        sampling from the t=961 latents → decode.
        """
        opts = self.opts
        model = self.model
        f = crops.shape[0]
        hl = model.cfg.latent_size

        inpaint_img = crops * keep_mask
        z_inpaint = model.encode_first_stage(params, inpaint_img)
        mask_lat = jax.image.resize(keep_mask, (f, hl, hl, 1), method="bilinear")

        z_tar = model.encode_first_stage(params, crops)
        src_b = jnp.broadcast_to(src_crop, (f,) + src_crop.shape[1:])
        z_src = model.encode_first_stage(params, src_b)
        src_inpaint = src_crop * src_keep_mask
        z_inpaint_src = model.encode_first_stage(
            params, jnp.broadcast_to(src_inpaint, (f,) + src_inpaint.shape[1:])
        )
        src_mask_lat = jax.image.resize(
            jnp.broadcast_to(src_keep_mask, (f,) + src_keep_mask.shape[1:]),
            (f, hl, hl, 1),
            method="bilinear",
        )

        # The reference co-inverts cat([target, source]) with
        # cat([inverse_cond, cond_w_src]) (:514-541) — but hooks are OFF
        # during inversion (ddim_w_inv.py:389), batch elements are
        # independent, and only the target chunk is ever saved/consumed
        # (ddim_w_inv.py:464-486, start code :541). The source chunk is dead
        # compute; inverting the target alone is output-identical and halves
        # the inversion cost. Set co_invert_source=True for the literal
        # reference batch shape.
        if self.opts.co_invert_source:
            z2 = jnp.concatenate([z_tar, z_src], axis=0)
            inv_c = jnp.concatenate([inverse_cond, cond_w_src], axis=0)
            inv_inpaint = jnp.concatenate([z_inpaint, z_inpaint_src], axis=0)
            inv_mask = jnp.concatenate([mask_lat, src_mask_lat], axis=0)
        else:
            z2, inv_c, inv_inpaint, inv_mask = z_tar, inverse_cond, z_inpaint, mask_lat
        # In recon-free mode the ONLY consumed inversion product is the
        # t=961 start code (the reference's ddim_latents_961.pt, :541 — the
        # second-to-last entry for S=50; the last step's output is computed
        # and discarded there). Skipping that final ascending step is
        # output-identical and saves one 1-chunk UNet pass.
        skip = 1 if (not opts.keep_recon_chunk and opts.inversion_steps >= 2) else 0
        _, inv_latents = ddim_invert(
            model, params, z2, inv_c, inv_inpaint, inv_mask,
            num_steps=opts.inversion_steps, keep=f,
            encoder_interval=opts.encoder_interval,
            skip_last=skip,
        )
        if skip:
            start_code = inv_latents[-1]
        else:
            # second-to-last entry = t=961 for S=50 (timesteps end at 981)
            start_code = inv_latents[-2] if opts.inversion_steps >= 2 else inv_latents[-1]

        flow_q = None
        if has_flow:
            hq = model.cfg.latent_size  # 64 tokens per side at 512px
            flow_q = resize_flow(flow, hq, hq)

        flow0_q = None
        if fgats_flow0 is not None:
            hq = model.cfg.latent_size
            flow0_q = resize_flow(fgats_flow0, hq, hq)

        result = vface_sample(
            model, params, start_code, cond, uncond, inverse_cond,
            inv_latents, z_inpaint, mask_lat, self.injection, flow=flow_q,
            num_steps=opts.ddim_steps, cfg_scale=opts.cfg_scale, eta=opts.eta,
            encoder_interval=opts.encoder_interval,
            drop_recon_chunk=not opts.keep_recon_chunk,
            fgats_prev=fgats_prev, fgats_flow0=flow0_q,
            return_fgats_carry=return_fgats,
            flow_pair_mask=pair_mask,
        )
        z0 = result[0]
        out = model.decode_first_stage(params, z0)
        out01 = jnp.clip((out + 1.0) * 0.5, 0.0, 1.0)
        if return_fgats:
            return out01, result[2]
        return out01

    def _swap_window_pasted_impl(
        self, params, frames01_w, inv_coeffs_w, crops, keep_mask, *args,
        has_flow=False, return_fgats=False, **kw,
    ):
        res = self._swap_window_impl(
            params, crops, keep_mask, *args,
            has_flow=has_flow, return_fgats=return_fgats, **kw,
        )
        swapped = res[0] if return_fgats else res
        bg = self.decode_with_background(params, frames01_w * 2.0 - 1.0)
        pasted = paste_back(bg, swapped, inv_coeffs_w, 1.0 - keep_mask)
        return (pasted, res[1]) if return_fgats else pasted

    # ---------------------------------------------------- pipelined packs
    def _encode_pack(self, params, crops, keep_mask):
        """Shared encode stage: (z_tar, z_inpaint, mask_lat) for one pack."""
        f = crops.shape[0]
        hl = self.model.cfg.latent_size
        z_inpaint = self.model.encode_first_stage(params, crops * keep_mask)
        mask_lat = jax.image.resize(keep_mask, (f, hl, hl, 1), method="bilinear")
        z_tar = self.model.encode_first_stage(params, crops)
        return z_tar, z_inpaint, mask_lat

    def _invert_pack_impl(self, params, crops, keep_mask, inverse_cond):
        """Prologue: encode + inversion-only scan → (start_code, z_inpaint,
        mask_lat) for the first pack (recon-free: only the t=961 start code
        is consumed, so skip_last=1 — see _swap_window_impl)."""
        z_tar, z_inpaint, mask_lat = self._encode_pack(params, crops, keep_mask)
        x_T, _ = ddim_invert(
            self.model, params, z_tar, inverse_cond, z_inpaint, mask_lat,
            num_steps=self.opts.inversion_steps, keep=1, skip_last=1,
        )
        return x_T, z_inpaint, mask_lat

    def _pipelined_step_impl(
        self,
        params,
        frames01_i,     # (F,H,W,3) pack i original frames [0,1]
        inv_coeffs_i,   # (F,8)
        keep_i,         # (F,S,S,1)
        start_i,        # (F,hl,hl,4) pack i start code (from inversion)
        z_inpaint_i,
        mask_lat_i,
        cond_i,
        uncond_i,
        flow_i,
        pair_mask_i,
        crops_next,     # (G,S,S,3) pack i+1 crops [-1,1]
        keep_next,
        inv_cond_next,
        has_flow: bool = False,
    ):
        """Steady state: sample pack i (2-chunk CFG + FSAI/FGATS) while pack
        i+1's inversion rides the same UNet evals as bystander rows; then
        decode + background trick + paste-back for pack i. Output-exact vs
        the sequential loop (test_pipelined_pack_bit_exact)."""
        from vface_tpu.samplers.vface import vface_sample_pipelined

        opts = self.opts
        z_tar_n, z_inp_n, ml_n = self._encode_pack(params, crops_next, keep_next)
        flow_q = None
        if has_flow:
            hq = self.model.cfg.latent_size
            flow_q = resize_flow(flow_i, hq, hq)
        z0, _traj, start_next = vface_sample_pipelined(
            self.model, params, start_i, cond_i, uncond_i,
            z_inpaint_i, mask_lat_i, self.injection,
            next_z0=z_tar_n, next_cond=inv_cond_next,
            next_inpaint=z_inp_n, next_mask=ml_n,
            inversion_steps=opts.inversion_steps, skip_last=1,
            flow=flow_q, num_steps=opts.ddim_steps,
            cfg_scale=opts.cfg_scale, eta=opts.eta,
            flow_pair_mask=pair_mask_i,
        )
        out01 = jnp.clip((self.model.decode_first_stage(params, z0) + 1.0) * 0.5, 0.0, 1.0)
        bg = self.decode_with_background(params, frames01_i * 2.0 - 1.0)
        pasted = paste_back(bg, out01, inv_coeffs_i, 1.0 - keep_i)
        return pasted, start_next, z_inp_n, ml_n

    def _final_pack_impl(
        self,
        params,
        frames01_i,
        inv_coeffs_i,
        keep_i,
        start_i,
        z_inpaint_i,
        mask_lat_i,
        cond_i,
        uncond_i,
        flow_i,
        pair_mask_i,
        has_flow: bool = False,
    ):
        """Epilogue: sampling-only for the last pack (no next inversion)."""
        opts = self.opts
        flow_q = None
        if has_flow:
            hq = self.model.cfg.latent_size
            flow_q = resize_flow(flow_i, hq, hq)
        dummy_inv = jnp.zeros((1,) + start_i.shape)
        z0, _ = vface_sample(
            self.model, params, start_i, cond_i, uncond_i, cond_i,
            dummy_inv, z_inpaint_i, mask_lat_i, self.injection, flow=flow_q,
            num_steps=opts.ddim_steps, cfg_scale=opts.cfg_scale, eta=opts.eta,
            drop_recon_chunk=True, flow_pair_mask=pair_mask_i,
        )
        out01 = jnp.clip((self.model.decode_first_stage(params, z0) + 1.0) * 0.5, 0.0, 1.0)
        bg = self.decode_with_background(params, frames01_i * 2.0 - 1.0)
        return paste_back(bg, out01, inv_coeffs_i, 1.0 - keep_i)

    def _superpack_impl(
        self,
        params,
        frames01_2,    # (2F,H,W,3) two packs' original frames [0,1]
        inv_coeffs_2,  # (2F,8)
        crops_2,       # (2F,S,S,3) crops [-1,1]
        keep_2,        # (2F,S,S,1)
        cond_2,
        uncond_2,
        inv_cond_2,
        flow_2,        # (2F-1,S,S,2) flow over the concatenated sequence
        pair_mask_A,   # (F-1,) or None — within-pack FGATS boundary masks
        pair_mask_B,
        has_flow: bool = False,
    ):
        """Two packs per program: ONE b=2F inversion scan (the v5e per-row
        batch sweet spot — the 1-chunk inversion at b=F is the worst-batched
        stage otherwise), then each pack's 2-chunk sampling at its usual
        b=2F, with the VAE encode/decode/background/paste also at 2F.
        Output-exact vs two sequential single-pack programs
        (test_superpacks_match_sequential): batch elements are independent in
        every stage that is batched wider, and the packs' FGATS flows are
        sliced apart (the cross-pack boundary pair is simply never used)."""
        opts = self.opts
        model = self.model
        f2 = crops_2.shape[0]
        f = f2 // 2

        def _per_half(fn, *arrays):
            """Apply ``fn`` to each pack half sequentially (a length-2
            lax.map): the 512² VAE stages at b=2F are the program's peak
            HBM tensors and OOM a single v5e chip — running them at b=F
            (the proven single-pack width) halves that peak while the
            b=2F inversion scan (the super-pack's point) is untouched."""
            xs = tuple(a.reshape((2, f) + a.shape[1:]) for a in arrays)
            ys = jax.lax.map(lambda t: fn(*t), xs)
            return jax.tree.map(
                lambda y: y.reshape((f2,) + y.shape[2:]), ys
            )

        z_tar, z_inpaint, mask_lat = _per_half(
            lambda c, k: self._encode_pack(params, c, k), crops_2, keep_2
        )
        x_T, _ = ddim_invert(
            model, params, z_tar, inv_cond_2, z_inpaint, mask_lat,
            num_steps=opts.inversion_steps, keep=1, skip_last=1,
            encoder_interval=opts.encoder_interval,
        )
        hq = model.cfg.latent_size
        dummy_inv = jnp.zeros((1, f) + x_T.shape[1:])

        def sample_half(sl, flow_sl, pm):
            flow_q = resize_flow(flow_2[flow_sl], hq, hq) if has_flow else None
            z0, _ = vface_sample(
                model, params, x_T[sl], cond_2[sl], uncond_2[sl], cond_2[sl],
                dummy_inv, z_inpaint[sl], mask_lat[sl], self.injection,
                flow=flow_q, num_steps=opts.ddim_steps,
                cfg_scale=opts.cfg_scale, eta=opts.eta,
                encoder_interval=opts.encoder_interval,
                drop_recon_chunk=True, flow_pair_mask=pm,
            )
            return z0

        if opts.merge_sampling:
            # one 2-chunk CFG scan over BOTH packs (b = 2 * 2F rows/eval):
            # FGATS is pair-masked at the pack boundary exactly like window
            # boundaries (the boundary flow slot is zero-filled and never
            # blended), so this is output-exact vs the two per-pack scans
            ones = jnp.ones((f - 1,), jnp.float32)
            pa = ones if pair_mask_A is None else pair_mask_A
            pb = ones if pair_mask_B is None else pair_mask_B
            pm_full = jnp.concatenate([pa, jnp.zeros((1,), jnp.float32), pb])
            flow_q = resize_flow(flow_2, hq, hq) if has_flow else None
            z0, _ = vface_sample(
                model, params, x_T, cond_2, uncond_2, cond_2,
                jnp.zeros((1, f2) + x_T.shape[1:]), z_inpaint, mask_lat,
                self.injection, flow=flow_q, num_steps=opts.ddim_steps,
                cfg_scale=opts.cfg_scale, eta=opts.eta,
                encoder_interval=opts.encoder_interval,
                drop_recon_chunk=True, flow_pair_mask=pm_full,
            )
        else:
            z0_a = sample_half(slice(0, f), slice(0, f - 1), pair_mask_A)
            z0_b = sample_half(slice(f, f2), slice(f, f2 - 1), pair_mask_B)
            z0 = jnp.concatenate([z0_a, z0_b], axis=0)
        out01 = _per_half(
            lambda z: jnp.clip(
                (model.decode_first_stage(params, z) + 1.0) * 0.5, 0.0, 1.0
            ),
            z0,
        )
        bg = _per_half(
            lambda fr: self.decode_with_background(params, fr * 2.0 - 1.0),
            frames01_2,
        )
        return paste_back(bg, out01, inv_coeffs_2, 1.0 - keep_2)

    def _superpack_pair_mask(self):
        opts = self.opts
        w = opts.window * max(1, opts.batch_windows)
        if opts.batch_windows <= 1:
            return None
        m = np.ones((w - 1,), np.float32)
        for b0 in range(opts.window, w, opts.window):
            m[b0 - 1] = 0.0
        return jnp.asarray(m) if (m == 0).any() else None

    def _swap_frames_superpacked_streaming(
        self, params, aux_params, frames01_np, src_clip, src_crop01, src_lm,
        src_keep, manifest, window_sink, remove_classes,
    ) -> np.ndarray:
        """SURVEY §7's host/device double buffering for the super-pack path
        (VERDICT r4 item 4): while super-pack i occupies the device, group
        i+1's raw frames ride up over DMA, pack i−1's output rides down and
        is persisted, and the host solves group i+1's perspective
        coefficients — so the only un-overlapped work between packs is the
        small aux device programs (landmarks/parse/conditioning/flow, real
        device work the device-only bench excludes) plus group 0's prologue.

        Per-pack schedule (device executes in dispatch order):
          1. dispatch super-pack i                      (big program)
          2. device_put frames(i+1)                     (DMA, overlaps 1)
          3. dispatch landmark/quad programs (i+1)      (queued after 1)
          4. emit(i): async D2H; fetch+persist pack i−1 (host, overlaps 1)
          5. finish align (i+1): quad fetch syncs on 3, host coeff solve,
             dispatch parse/conditioning/flow (i+1)     (queued after 3)

        Outputs are bit-identical to the non-streaming super-pack loop (the
        degenerate-quad fallback chain carries across groups via
        ``align_finish(prev_quad=...)``); pinned by
        tests/test_pipeline_e2e.py::test_streaming_superpack_bit_exact.
        """
        opts = self.opts
        n = int(frames01_np.shape[0])
        w = opts.window * max(1, opts.batch_windows)
        g = 2 * w
        n_groups = n // g
        pm = self._superpack_pair_mask()

        import os as _os
        import time as _time

        _trace = bool(_os.environ.get("VFACE_STREAM_TRACE"))
        _t0 = _time.perf_counter()

        def _tr(tag):
            if _trace:
                print(f"[stream +{_time.perf_counter() - _t0:7.2f}s] {tag}",
                      flush=True)

        out_frames = []
        pending = None

        def _flush_pending():
            nonlocal pending
            if pending is None:
                return
            ps0, parr = pending
            pending = None
            _tr(f"flush s0={ps0} fetch…")
            arr = np.asarray(parr)
            _tr(f"flush s0={ps0} fetched")
            if manifest is not None and window_sink is not None:
                paths = window_sink(ps0, arr)
                manifest.mark_done(ps0, arr.shape[0], paths)
            out_frames.append(arr)

        def emit(s0, pasted):
            nonlocal pending
            if hasattr(pasted, "copy_to_host_async"):
                pasted.copy_to_host_async()
            _flush_pending()
            pending = (s0, pasted)

        def upload_and_begin(gi):
            sl = slice(gi * g, (gi + 1) * g)
            _tr(f"upload g{gi}…")
            fr = jax.device_put(frames01_np[sl])  # async H2D
            quad, qsize = self.align_begin(aux_params, fr)
            # start the D2H of the small quad results NOW: on the tunneled
            # backend a synchronous fetch RPC behaves as a full queue
            # barrier (and can wedge when the producer sits behind a
            # running super-pack); copy_to_host_async is the only
            # non-barrier D2H, so the later np.array(quad) in align_finish
            # just waits for this copy instead of issuing a barrier fetch
            for buf in (quad, qsize):
                if hasattr(buf, "copy_to_host_async"):
                    buf.copy_to_host_async()
            _tr(f"upload g{gi} dispatched")
            return dict(s0=sl.start, fr=fr, quad=quad, qsize=qsize)

        def finish_prep(st, prev_quad):
            _tr(f"prep s0={st['s0']} align_finish…")
            crops01_g, coeffs, prev_quad = self.align_finish(
                st["fr"], st["quad"], st["qsize"], prev_quad
            )
            _tr(f"prep s0={st['s0']} parse…")
            seg = self.parse_masks(aux_params, crops01_g)
            _, keep = inpaint_inputs(crops01_g * 2 - 1, seg, remove_classes)
            c = crops01_g * 2 - 1
            _tr(f"prep s0={st['s0']} cond…")
            cond, uncond, inv_c, _ = self.window_conditionings(
                params, aux_params, c, keep, src_clip, src_crop01, src_lm
            )
            _tr(f"prep s0={st['s0']} flow…")
            flow = self.compute_flow_superpack(aux_params, crops01_g)
            _tr(f"prep s0={st['s0']} done")
            st.update(crops01=crops01_g, c=c, keep=keep, coeffs=coeffs,
                      cond=cond, uncond=uncond, inv_c=inv_c, flow=flow)
            return st, prev_quad

        # Depth-2 lookahead: group i+1's ENTIRE prep (quad fetch → host
        # coeff solve → parse/conditioning/flow dispatch) happens BEFORE
        # super-pack i is dispatched, so every aux program sits in the
        # device queue ahead of the big program and the host solve overlaps
        # super-pack i−1's tail. Steady-state device stream is then packed
        # [aux(i+1)][superpack(i)][aux(i+2)][superpack(i+1)]… with the only
        # host-blocking fetches (quad(i+1), pack(i−1) outputs) landing on
        # buffers whose programs completed one super-pack ago.
        cur, prev_quad = finish_prep(upload_and_begin(0), None)
        nxt_st = upload_and_begin(1) if n_groups > 1 else None
        for i in range(n_groups):
            nxt = None
            if nxt_st is not None:
                nxt, prev_quad = finish_prep(nxt_st, prev_quad)
            _tr(f"superpack s0={cur['s0']} dispatch…")
            pasted = self._superpack_jit(
                params, cur["fr"], cur["coeffs"], cur["c"], cur["keep"],
                cur["cond"], cur["uncond"], cur["inv_c"], cur["flow"],
                pm, pm, has_flow=True,
            )
            _tr(f"superpack s0={cur['s0']} dispatched")
            # upload i+2 only AFTER the big program is queued: keeps at most
            # two groups' inputs resident (the super-pack runs near the HBM
            # edge at 512²; a third in-flight group forces spills)
            nxt_st = (
                upload_and_begin(i + 2) if i + 2 < n_groups else None
            )
            emit(cur["s0"], pasted)
            if nxt is not None:
                cur = nxt
        _flush_pending()

        # trailing packs/short window (< one group): standard per-pack path
        # (same chunking as the non-streaming loop — bit-exactness), the
        # alignment fallback chain carried through
        for s0 in range(n_groups * g, n, w):
            sl = slice(s0, min(s0 + w, n))
            fr = jax.device_put(frames01_np[sl])
            quad, qsize = self.align_begin(aux_params, fr)
            crops01_r, coeffs, prev_quad = self.align_finish(
                fr, quad, qsize, prev_quad
            )
            seg = self.parse_masks(aux_params, crops01_r)
            _, keep = inpaint_inputs(crops01_r * 2 - 1, seg, remove_classes)
            c = crops01_r * 2 - 1
            cond, uncond, inv_c, c_src = self.window_conditionings(
                params, aux_params, c, keep, src_clip, src_crop01, src_lm
            )
            nf = sl.stop - s0
            flow = self.compute_flow(aux_params, crops01_r) if nf > 1 else None
            pair_mask = None
            if flow is not None and opts.batch_windows > 1:
                m = np.ones((nf - 1,), np.float32)
                for b0 in range(opts.window, nf, opts.window):
                    m[b0 - 1] = 0.0
                if (m == 0).any():
                    pair_mask = jnp.asarray(m)
            pasted = self.swap_window_pasted(
                params, fr, coeffs, c, keep, cond, uncond, inv_c, c_src,
                src_crop01 * 2 - 1, src_keep, flow, pair_mask=pair_mask,
            )
            arr = np.asarray(pasted)
            if manifest is not None and window_sink is not None:
                paths = window_sink(s0, arr)
                manifest.mark_done(s0, arr.shape[0], paths)
            out_frames.append(arr)
        return np.concatenate([np.asarray(o) for o in out_frames], axis=0)

    def _swap_frames_superpacked(
        self, params, aux_params, frames01, crops01, inv_coeffs, keep_mask,
        src_clip, src_crop01, src_lm, src_keep, manifest, window_sink,
    ) -> np.ndarray:
        """Host loop for opts.invert_packs == 2: packs are processed in
        pairs through one super-pack program; an odd trailing pack and the
        final short window use the standard single-window program."""
        opts = self.opts
        n = int(frames01.shape[0])
        w = opts.window * max(1, opts.batch_windows)
        n_full = n // w

        def within_pack_mask():
            if opts.batch_windows <= 1:
                return None
            m = np.ones((w - 1,), np.float32)
            for b0 in range(opts.window, w, opts.window):
                m[b0 - 1] = 0.0
            return jnp.asarray(m) if (m == 0).any() else None

        pm = within_pack_mask()
        out_frames = []
        pending = None

        def _flush_pending():
            nonlocal pending
            if pending is None:
                return
            ps0, parr = pending
            pending = None
            arr = np.asarray(parr)
            if manifest is not None and window_sink is not None:
                paths = window_sink(ps0, arr)
                manifest.mark_done(ps0, arr.shape[0], paths)
            out_frames.append(arr)

        def emit(s0, pasted):
            nonlocal pending
            if hasattr(pasted, "copy_to_host_async"):
                pasted.copy_to_host_async()
            _flush_pending()
            if manifest is not None and window_sink is not None:
                pending = (s0, pasted)
            else:
                out_frames.append(pasted)

        def conds_for(sl):
            c = crops01[sl] * 2 - 1
            km = keep_mask[sl]
            cond, uncond, inv_c, c_src = self.window_conditionings(
                params, aux_params, c, km, src_clip, src_crop01, src_lm
            )
            return c, km, cond, uncond, inv_c, c_src

        i = 0
        while i + 1 < n_full:
            s0 = i * w
            sl = slice(s0, s0 + 2 * w)
            c, km, cond, uncond, inv_c, _ = conds_for(sl)
            flow = self.compute_flow_superpack(aux_params, crops01[sl])
            pasted = self._superpack_jit(
                params, frames01[sl], inv_coeffs[sl], c, km,
                cond, uncond, inv_c, flow, pm, pm, has_flow=True,
            )
            emit(s0, pasted)
            i += 2
        # odd trailing pack and/or short remainder via the standard program
        for s0 in range(i * w, n, w):
            sl = slice(s0, min(s0 + w, n))
            c, km, cond, uncond, inv_c, c_src = conds_for(sl)
            nf = sl.stop - s0
            flow = self.compute_flow(aux_params, crops01[sl]) if nf > 1 else None
            pair_mask = None
            if flow is not None and opts.batch_windows > 1:
                m = np.ones((nf - 1,), np.float32)
                for b0 in range(opts.window, nf, opts.window):
                    m[b0 - 1] = 0.0
                if (m == 0).any():
                    pair_mask = jnp.asarray(m)
            pasted = self.swap_window_pasted(
                params, frames01[sl], inv_coeffs[sl], c, km,
                cond, uncond, inv_c, c_src,
                src_crop01 * 2 - 1, src_keep, flow, pair_mask=pair_mask,
            )
            emit(s0, pasted)
        _flush_pending()
        return np.concatenate([np.asarray(o) for o in out_frames], axis=0)

    def _swap_windows_batched_impl(self, params, *wargs):
        return jax.vmap(
            lambda c, k, co, un, ic, cs, sc, sk, fl: self._swap_window_impl(
                params, c, k, co, un, ic, cs, sc, sk, fl, has_flow=True
            )
        )(*wargs)

    def swap_windows_batched(
        self,
        params,
        crops_w: jax.Array,      # (W, F, S, S, 3) target crops [-1,1]
        keep_w: jax.Array,       # (W, F, S, S, 1)
        cond_w: jax.Array,       # (W, F, 1, D)
        uncond_w: jax.Array,
        inv_cond_w: jax.Array,
        cond_src_w: jax.Array,
        src_crop_w: jax.Array,   # (W, 1, S, S, 3)
        src_keep_w: jax.Array,   # (W, 1, S, S, 1)
        flow_w: jax.Array,       # (W, F-1, S, S, 2)
        mesh=None,
    ) -> jax.Array:
        """Process W independent windows at once, vmapped over the window
        axis and (optionally) sharded over the mesh's ``data`` axis.

        Windows carry no cross-window state (SURVEY §5: "no cross-batch
        temporal state"), so multi-chip inference is pure data parallelism
        over windows: throughput scales linearly with chips (v5e-8 ⇒ 8×
        the single-chip 0.51 frames/s). Returns (W, F, S, S, 3) in [0,1].
        """
        args = (crops_w, keep_w, cond_w, uncond_w, inv_cond_w, cond_src_w,
                src_crop_w, src_keep_w, flow_w)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(mesh, P("data"))
            repl = NamedSharding(mesh, P())
            params = jax.device_put(params, repl)
            args = tuple(jax.device_put(a, shard) for a in args)
        return self._windows_jit(params, *args)

    def swap_video_frames_sharded(
        self,
        params,
        aux_params,
        frames01: np.ndarray,
        source01: np.ndarray,
        mesh,
        remove_classes=None,
        manifest=None,
        window_sink=None,
        frame_keep=None,
        source_keep=None,
    ) -> np.ndarray:
        """Multi-chip variant of :meth:`swap_video_frames`: full windows are
        stacked and sharded over the mesh's ``data`` axis (W per round = mesh
        size, padded by repeating the last window), the trailing short window
        (if any) runs through the sequential single-window path. Outputs are
        identical to the sequential loop — windows are independent.

        ``frame_keep`` / ``source_keep`` follow :meth:`swap_video_frames`'s
        precomputed-mask contract (skip the BiSeNet parse of that side).
        """
        from vface_tpu.preprocess.masks import TRAIN_REMOVE

        remove_classes = remove_classes or TRAIN_REMOVE
        opts = self.opts
        frames01 = jnp.asarray(frames01)
        n = int(frames01.shape[0])
        w = opts.window
        n_full = n // w

        crops01, inv_coeffs = self.align_crops(aux_params, frames01)
        if frame_keep is not None:
            keep_mask = self._coerce_keep(frame_keep, crops01.shape)
        else:
            seg = self.parse_masks(aux_params, crops01)
            _, keep_mask = inpaint_inputs(crops01 * 2 - 1, seg, remove_classes)

        src = jnp.asarray(source01)[None]
        src_crop01, _ = self.align_crops(aux_params, src)
        if source_keep is not None:
            src_keep = self._coerce_keep(
                jnp.asarray(source_keep)[None], src_crop01.shape
            )
        else:
            src_seg = self.parse_masks(aux_params, src_crop01)
            _, src_keep = inpaint_inputs(
                src_crop01 * 2 - 1, src_seg, remove_classes
            )
        src_face_only = src_crop01 * (1.0 - src_keep)
        src_clip = clip_preprocess(src_face_only, self.model.cfg.cond.clip.image_size)
        src_lm = landmarks_to_vector(self.detect_landmarks(aux_params, src_crop01))
        src_crop = src_crop01 * 2 - 1

        out = np.zeros(frames01.shape, np.float32)

        def finish(s0, swapped, count):
            bg = self.decode_with_background(params, frames01[s0 : s0 + count] * 2 - 1)
            pasted = paste_back(
                bg, swapped[:count], inv_coeffs[s0 : s0 + count],
                1.0 - keep_mask[s0 : s0 + count],
            )
            pasted = np.asarray(pasted)
            if manifest is not None and window_sink is not None:
                paths = window_sink(s0, pasted)
                manifest.mark_done(s0, pasted.shape[0], paths)
            out[s0 : s0 + count] = pasted

        if n_full:
            # per-window tensors; flow pairs stay within each window
            # (window w's flows are global pairs s0..s0+F-2)
            per = []
            for wi in range(n_full):
                s0 = wi * w
                sl = slice(s0, s0 + w)
                c = crops01[sl] * 2 - 1
                km = keep_mask[sl]
                flow = self.compute_flow(aux_params, crops01[sl])
                cond, uncond, inv_c, c_src = self.window_conditionings(
                    params, aux_params, c, km, src_clip, src_crop01, src_lm
                )
                per.append((c, km, cond, uncond, inv_c, c_src, src_crop, src_keep, flow))
            n_data = mesh.shape["data"]
            for g0 in range(0, n_full, n_data):
                group = per[g0 : g0 + n_data]
                real = len(group)
                while len(group) < n_data:  # pad: repeat the last window
                    group.append(group[-1])
                stacked = tuple(jnp.stack(parts) for parts in zip(*group))
                swapped_w = self.swap_windows_batched(params, *stacked, mesh=mesh)
                for wi in range(real):
                    finish((g0 + wi) * w, swapped_w[wi], w)

        rem = n - n_full * w
        if rem:
            s0 = n_full * w
            sl = slice(s0, n)
            c = crops01[sl] * 2 - 1
            km = keep_mask[sl]
            flow = self.compute_flow(aux_params, crops01[sl]) if rem > 1 else None
            cond, uncond, inv_c, c_src = self.window_conditionings(
                params, aux_params, c, km, src_clip, src_crop01, src_lm
            )
            swapped = self.swap_window(
                params, c, km, cond, uncond, inv_c, c_src, src_crop, src_keep, flow
            )
            finish(s0, swapped, rem)
        return out

    def _fs_post_impl(self, params, z0, frames01_w, inv_coeffs_w, keep_mask):
        """Frame-sharded epilogue: decode + background trick + paste-back
        (all frame-local, so the program partitions data-parallel over the
        mesh when its inputs are frame-sharded)."""
        out = self.model.decode_first_stage(params, z0)
        out01 = jnp.clip((out + 1.0) * 0.5, 0.0, 1.0)
        bg = self.decode_with_background(params, frames01_w * 2.0 - 1.0)
        return paste_back(bg, out01, inv_coeffs_w, 1.0 - keep_mask)

    def swap_video_frames_frame_sharded(
        self,
        params,
        aux_params,
        frames01: np.ndarray,
        source01: np.ndarray,
        mesh,
        remove_classes=None,
        axis_name: str = "data",
    ) -> np.ndarray:
        """LATENCY multi-chip variant (CLI ``--mesh_frames N``): windows run
        one at a time with their F frames sharded over the mesh's
        ``axis_name`` — SURVEY §7's context-parallel analog of the reference's
        one-window-per-GPU batching (`VFace_inference_batch.py:193-670`).
        Inversion/VAE stages are frame-local and partition as pure data
        parallelism; the FGATS flow blend crosses shard boundaries through
        the 1-frame ``ppermute`` halo (`parallel/frame_sharded.py`), so
        outputs match the unsharded sequential loop
        (tests/test_pipeline_e2e.py::test_frame_sharded_video_matches_sequential).

        Use when chips ≥ windows (a short clip on many chips — first frames
        ready in ~1/N the window wall time); the THROUGHPUT path for long
        clips is :meth:`swap_video_frames_sharded` (independent windows).

        Eligibility (enforced): the recon-free operating point
        (``keep_recon_chunk=False``), no ``cross_window_carry``,
        ``batch_windows == 1``, exact encoders (``encoder_interval == 1``),
        and window size divisible by the mesh axis. A trailing short window
        falls back to the sequential single-window program.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        from vface_tpu.parallel.frame_sharded import vface_sample_frame_sharded
        from vface_tpu.preprocess.masks import TRAIN_REMOVE

        opts = self.opts
        n_mesh = mesh.shape[axis_name]
        if opts.keep_recon_chunk or opts.cross_window_carry:
            raise ValueError(
                "frame-sharded swapping requires the recon-free operating "
                "point (keep_recon_chunk=False) without cross_window_carry"
            )
        if opts.batch_windows != 1 or opts.encoder_interval != 1:
            raise ValueError(
                "frame-sharded swapping runs one window per program "
                "(batch_windows=1) with exact encoders (encoder_interval=1)"
            )
        if opts.window % n_mesh:
            raise ValueError(
                f"window ({opts.window}) must divide over the {axis_name} "
                f"axis ({n_mesh})"
            )
        if opts.window < 2:
            raise ValueError("frame-sharded swapping is the flow-on path; window >= 2")

        remove_classes = remove_classes or TRAIN_REMOVE
        frames01 = jnp.asarray(frames01)
        n = int(frames01.shape[0])
        w = opts.window
        n_full = n // w
        hl = self.model.cfg.latent_size

        crops01, inv_coeffs = self.align_crops(aux_params, frames01)
        seg = self.parse_masks(aux_params, crops01)
        _, keep_mask = inpaint_inputs(crops01 * 2 - 1, seg, remove_classes)

        src = jnp.asarray(source01)[None]
        src_crop01, _ = self.align_crops(aux_params, src)
        src_seg = self.parse_masks(aux_params, src_crop01)
        _, src_keep = inpaint_inputs(src_crop01 * 2 - 1, src_seg, remove_classes)
        src_face_only = src_crop01 * (1.0 - src_keep)
        src_clip = clip_preprocess(src_face_only, self.model.cfg.cond.clip.image_size)
        src_lm = landmarks_to_vector(self.detect_landmarks(aux_params, src_crop01))
        src_crop = src_crop01 * 2 - 1

        shard = NamedSharding(mesh, P(axis_name))
        out = np.zeros(frames01.shape, np.float32)
        for wi in range(n_full):
            s0 = wi * w
            sl = slice(s0, s0 + w)
            c = crops01[sl] * 2 - 1
            km = keep_mask[sl]
            flow = self.compute_flow(aux_params, crops01[sl])
            cond, uncond, inv_c, _ = self.window_conditionings(
                params, aux_params, c, km, src_clip, src_crop01, src_lm
            )
            c, km, cond, uncond, inv_c = (
                jax.device_put(x, shard) for x in (c, km, cond, uncond, inv_c)
            )
            x_T, z_inpaint, mask_lat = self._invert_pack_jit(params, c, km, inv_c)
            z0 = vface_sample_frame_sharded(
                self.model, params, x_T, cond, uncond, inv_c,
                z_inpaint, mask_lat, self.injection,
                flow=resize_flow(flow, hl, hl), mesh=mesh,
                num_steps=opts.ddim_steps, cfg_scale=opts.cfg_scale,
                eta=opts.eta, axis_name=axis_name,
            )
            pasted = self._fs_post_jit(
                params, z0,
                jax.device_put(frames01[sl], shard),
                jax.device_put(inv_coeffs[sl], shard),
                km,
            )
            out[sl] = np.asarray(pasted)

        rem = n - n_full * w
        if rem:
            s0 = n_full * w
            sl = slice(s0, n)
            c = crops01[sl] * 2 - 1
            km = keep_mask[sl]
            flow = self.compute_flow(aux_params, crops01[sl]) if rem > 1 else None
            cond, uncond, inv_c, c_src = self.window_conditionings(
                params, aux_params, c, km, src_clip, src_crop01, src_lm
            )
            pasted = self.swap_window_pasted(
                params, frames01[sl], inv_coeffs[sl], c, km,
                cond, uncond, inv_c, c_src, src_crop, src_keep, flow,
            )
            out[sl] = np.asarray(pasted)
        return out

    def _swap_frames_pipelined(
        self, params, aux_params, frames01, crops01, inv_coeffs, keep_mask,
        src_clip, src_crop01, src_lm, src_keep, manifest, window_sink,
    ) -> np.ndarray:
        """Pipelined-pack host loop (opts.pipeline_packs — see SwapOptions).

        Program schedule per video: 1× prologue inversion, (n_packs−1)× the
        fused steady-state step (sampling of pack i + inversion of pack i+1
        in one scan), 1× sampling-only epilogue. Outputs are exactly the
        sequential loop's (test_pipelined_pack_bit_exact)."""
        opts = self.opts
        n = int(frames01.shape[0])
        w = opts.window * max(1, opts.batch_windows)
        n_full = n // w
        no_flow = jnp.zeros((0,) + crops01.shape[1:3] + (2,))

        def prep(i):
            s0 = i * w
            sl = slice(s0, s0 + w)
            c = crops01[sl] * 2 - 1
            km = keep_mask[sl]
            flow = self.compute_flow(aux_params, crops01[sl]) if w > 1 else None
            pair_mask = None
            if flow is not None and opts.batch_windows > 1:
                m = np.ones((w - 1,), np.float32)
                for b0 in range(opts.window, w, opts.window):
                    m[b0 - 1] = 0.0
                if (m == 0).any():
                    pair_mask = jnp.asarray(m)
            cond, uncond, inv_c, _ = self.window_conditionings(
                params, aux_params, c, km, src_clip, src_crop01, src_lm
            )
            return dict(s0=s0, c=c, km=km, flow=flow, pm=pair_mask,
                        cond=cond, uncond=uncond, inv_c=inv_c)

        out_frames = []
        pending = None

        def _flush_pending():
            nonlocal pending
            if pending is None:
                return
            ps0, parr = pending
            pending = None
            arr = np.asarray(parr)
            if manifest is not None and window_sink is not None:
                paths = window_sink(ps0, arr)
                manifest.mark_done(ps0, arr.shape[0], paths)
            out_frames.append(arr)

        def emit(s0, pasted):
            nonlocal pending
            if hasattr(pasted, "copy_to_host_async"):
                pasted.copy_to_host_async()
            _flush_pending()
            if manifest is not None and window_sink is not None:
                pending = (s0, pasted)
            else:
                out_frames.append(pasted)

        cur = prep(0)
        start, zi, ml = self._invert_pack_jit(params, cur["c"], cur["km"], cur["inv_c"])
        for i in range(n_full):
            s0 = cur["s0"]
            sl = slice(s0, s0 + w)
            fl = cur["flow"] if cur["flow"] is not None else no_flow
            if i + 1 < n_full:
                nxt = prep(i + 1)
                pasted, start, zi, ml = self._pipe_step_jit(
                    params, frames01[sl], inv_coeffs[sl], cur["km"],
                    start, zi, ml, cur["cond"], cur["uncond"], fl, cur["pm"],
                    nxt["c"], nxt["km"], nxt["inv_c"],
                    has_flow=cur["flow"] is not None,
                )
                emit(s0, pasted)
                cur = nxt
            else:
                pasted = self._final_pack_jit(
                    params, frames01[sl], inv_coeffs[sl], cur["km"],
                    start, zi, ml, cur["cond"], cur["uncond"], fl, cur["pm"],
                    has_flow=cur["flow"] is not None,
                )
                emit(s0, pasted)

        rem = n - n_full * w
        if rem:
            s0 = n_full * w
            sl = slice(s0, n)
            c = crops01[sl] * 2 - 1
            km = keep_mask[sl]
            flow = self.compute_flow(aux_params, crops01[sl]) if rem > 1 else None
            cond, uncond, inv_c, c_src = self.window_conditionings(
                params, aux_params, c, km, src_clip, src_crop01, src_lm
            )
            # the remainder window runs the standard single-window program
            pasted = self.swap_window_pasted(
                params, frames01[sl], inv_coeffs[sl], c, km,
                cond, uncond, inv_c, c_src,
                src_crop01 * 2 - 1, src_keep, flow,
            )
            emit(s0, pasted)
        _flush_pending()
        return np.concatenate([np.asarray(o) for o in out_frames], axis=0)

    @staticmethod
    def _coerce_keep(keep, crops_shape) -> jax.Array:
        """Precomputed keep masks → (N, S, S, 1) float at the crop size."""
        keep = jnp.asarray(keep, jnp.float32)
        if keep.ndim == 3:
            keep = keep[..., None]
        n, s = crops_shape[0], crops_shape[1]
        if keep.shape[1] != s or keep.shape[2] != s:
            # nearest, not bilinear: keep masks are binary and the parser
            # path / reference dataset resize masks with nearest — bilinear
            # would leave fractional edge values (ADVICE r4)
            keep = jax.image.resize(keep, (keep.shape[0], s, s, 1), "nearest")
        if keep.shape[0] != n:
            raise ValueError(f"frame_keep has {keep.shape[0]} masks for {n} frames")
        return keep

    def decode_with_background(self, params, frames: jax.Array) -> jax.Array:
        """The background-consistency trick (:611-623): encode+decode the
        original frame so pasted backgrounds share the VAE's color response.

        ``opts.background_res`` > 0 (approx lever): the roundtrip runs at that
        resolution and upsamples — ~(res/S)² of the full-res VAE cost; only
        background pixels differ (bound: scripts/bench_approx_levers.py)."""
        r = self.opts.background_res
        f, s = frames.shape[0], frames.shape[1]
        if r and r < s:
            small = jax.image.resize(frames, (f, r, r, 3), method="bilinear")
            z = self.model.encode_first_stage(params, small)
            out = self.model.decode_first_stage(params, z)
            out = jax.image.resize(out, (f, s, s, 3), method="bilinear")
        else:
            z = self.model.encode_first_stage(params, frames)
            out = self.model.decode_first_stage(params, z)
        return jnp.clip((out + 1.0) * 0.5, 0.0, 1.0)

    # ------------------------------------------------------------ full run
    def swap_video_frames(
        self,
        params,
        aux_params,
        frames01: np.ndarray,
        source01: np.ndarray,
        remove_classes=None,
        manifest=None,
        window_sink=None,
        frame_landmarks=None,
        frame_keep=None,
        source_keep=None,
    ) -> np.ndarray:
        """Host orchestration: align → parse → window loop → paste-back.

        frames01 (N, H, W, 3) float [0,1]; source01 (H, W, 3).
        Returns swapped full frames (N, H, W, 3) in [0,1].

        ``frame_keep`` / ``source_keep``: PRECOMPUTED keep masks (1 =
        background kept) in crop space, (N, S, S, 1) / (S, S, 1) — the
        reference's precomputed-mask mode (`crop_and_mask` writes mask dirs
        that `video_swap_dataset.py:86-409` loads instead of re-parsing;
        our `data.datasets.VideoDataset` yields them as ``inpaint_mask``).
        When given, the BiSeNet parse of that side is skipped entirely — no
        "bisenet" aux params needed.
        """
        from vface_tpu.preprocess.masks import TRAIN_REMOVE

        remove_classes = remove_classes or TRAIN_REMOVE
        opts = self.opts
        n = int(frames01.shape[0])
        w_pack = opts.window * max(1, opts.batch_windows)
        fresh_pre = manifest is None or not any(
            manifest.is_done(s0) for s0 in range(0, n, w_pack)
        )
        # streaming super-pack path (SURVEY §7 double buffering): host-
        # resident frames, default prep — prep per group overlaps the
        # previous group's device compute; src prep below is all it needs
        can_stream = (
            opts.invert_packs == 2
            and not opts.cross_window_carry
            and not opts.keep_recon_chunk
            and opts.inversion_steps >= 2
            and n >= 2 * w_pack
            and fresh_pre
            and frame_landmarks is None
            and frame_keep is None
            and isinstance(frames01, np.ndarray)
        )
        if can_stream:
            src = jnp.asarray(source01)[None]
            src_crop01, _ = self.align_crops(aux_params, src)
            if source_keep is not None:
                src_keep = self._coerce_keep(
                    jnp.asarray(source_keep)[None], src_crop01.shape
                )
            else:
                src_seg = self.parse_masks(aux_params, src_crop01)
                _, src_keep = inpaint_inputs(
                    src_crop01 * 2 - 1, src_seg, remove_classes
                )
            src_face_only = src_crop01 * (1.0 - src_keep)
            src_clip = clip_preprocess(
                src_face_only, self.model.cfg.cond.clip.image_size
            )
            src_lm = landmarks_to_vector(
                self.detect_landmarks(aux_params, src_crop01)
            )
            return self._swap_frames_superpacked_streaming(
                params, aux_params, frames01, src_clip, src_crop01, src_lm,
                src_keep, manifest, window_sink, remove_classes,
            )

        frames01 = jnp.asarray(frames01)

        crops01, inv_coeffs = self.align_crops(aux_params, frames01, landmarks=frame_landmarks)
        if frame_keep is not None:
            keep_mask = self._coerce_keep(frame_keep, crops01.shape)
        else:
            seg = self.parse_masks(aux_params, crops01)
            _, keep_mask = inpaint_inputs(crops01 * 2 - 1, seg, remove_classes)

        src = jnp.asarray(source01)[None]
        src_crop01, _ = self.align_crops(aux_params, src)
        if source_keep is not None:
            src_keep = self._coerce_keep(
                jnp.asarray(source_keep)[None], src_crop01.shape
            )
        else:
            src_seg = self.parse_masks(aux_params, src_crop01)
            _, src_keep = inpaint_inputs(src_crop01 * 2 - 1, src_seg, remove_classes)
        # masked CLIP-normalised source reference (:314-356)
        src_face_only = src_crop01 * (1.0 - src_keep)
        src_clip = clip_preprocess(src_face_only, self.model.cfg.cond.clip.image_size)
        src_lm = landmarks_to_vector(self.detect_landmarks(aux_params, src_crop01))

        w = opts.window * max(1, opts.batch_windows)
        # pipelined-pack fast path: output-exact, recon-free operating point
        # only; resumed runs and short clips use the sequential loop
        can_pipeline = (
            opts.pipeline_packs
            and not opts.cross_window_carry
            and not opts.keep_recon_chunk
            and opts.encoder_interval == 1
            and opts.inversion_steps <= opts.ddim_steps + 1
            and n >= w + 1
            and (manifest is None or not any(
                manifest.is_done(s0) for s0 in range(0, n, w)
            ))
        )
        fresh = manifest is None or not any(
            manifest.is_done(s0) for s0 in range(0, n, w)
        )
        can_superpack = (
            opts.invert_packs == 2
            and not opts.cross_window_carry
            and not opts.keep_recon_chunk
            and opts.inversion_steps >= 2
            and n >= 2 * w
            and fresh
        )
        if can_superpack:
            return self._swap_frames_superpacked(
                params, aux_params, frames01, crops01, inv_coeffs, keep_mask,
                src_clip, src_crop01, src_lm, src_keep, manifest, window_sink,
            )
        if can_pipeline:
            return self._swap_frames_pipelined(
                params, aux_params, frames01, crops01, inv_coeffs, keep_mask,
                src_clip, src_crop01, src_lm, src_keep, manifest, window_sink,
            )

        out_frames = []
        carry = None  # cross-window FGATS state (opts.cross_window_carry)
        pending = None  # (s0, device array) awaiting fetch+sink (resumable mode)

        def _flush_pending():
            # fetch + persist the PREVIOUS window only after the next one is
            # dispatched: the D2H transfer and PNG writes overlap compute
            nonlocal pending
            if pending is None:
                return
            ps0, parr = pending
            pending = None
            arr = np.asarray(parr)
            paths = window_sink(ps0, arr)
            manifest.mark_done(ps0, arr.shape[0], paths)
            out_frames.append(arr)

        for s0 in range(0, n, w):
            sl = slice(s0, min(s0 + w, n))
            if manifest is not None and manifest.is_done(s0):
                # preemption-safe resume: completed windows are skipped and
                # re-read from the sink's storage (reference idempotency,
                # VFace_inference_batch.py:889-891 / SURVEY §5)
                _flush_pending()
                done = manifest.data["windows"][str(s0)]
                cached = [np.asarray(_load_png01(p)) for p in done["outputs"]]
                out_frames.append(np.stack(cached))
                carry = None  # resumed windows have no carry state
                continue
            c = crops01[sl] * 2 - 1
            km = keep_mask[sl]
            nf = sl.stop - s0
            flow = self.compute_flow(aux_params, crops01[sl]) if nf > 1 else None
            # window packing (batch_windows > 1): frames of several windows
            # ride one program; the FGATS blend is masked at the window
            # boundaries so the result stays bit-equal to separate windows —
            # unless cross_window_carry, where boundary blending is the point
            pair_mask = None
            if flow is not None and opts.batch_windows > 1 and not opts.cross_window_carry:
                m = np.ones((nf - 1,), np.float32)
                for b0 in range(opts.window, nf, opts.window):
                    m[b0 - 1] = 0.0
                if (m == 0).any():
                    pair_mask = jnp.asarray(m)
            cond, uncond, inv_c, c_src = self.window_conditionings(
                params, aux_params, c, km, src_clip, src_crop01, src_lm
            )
            want_carry = opts.cross_window_carry and flow is not None
            flow0 = None
            if want_carry and carry is not None and s0 > 0:
                # boundary flow: window's frame 0 back to the previous
                # window's last frame (same backward-direction contract as
                # compute_flow)
                # jitted via compute_flow (2-frame window → 1 flow pair)
                flow0 = self.compute_flow(aux_params, crops01[s0 - 1 : s0 + 1])
            pasted = self.swap_window_pasted(
                params, frames01[sl], inv_coeffs[sl], c, km,
                cond, uncond, inv_c, c_src,
                src_crop01 * 2 - 1, src_keep, flow,
                fgats_prev=carry if (want_carry and flow0 is not None) else None,
                fgats_flow0=flow0,
                return_fgats=want_carry,
                pair_mask=pair_mask,
            )
            if want_carry:
                pasted, carry = pasted
            else:
                carry = None
            # Kick off the D2H copy NOW and defer the fetch: the transfer of
            # window i rides under window i+1's compute instead of
            # serialising (the tunnel's ~4 s/window fetch was previously all
            # exposed — per window in resumable mode, at the end otherwise).
            if hasattr(pasted, "copy_to_host_async"):
                pasted.copy_to_host_async()
            if manifest is not None and window_sink is not None:
                # resumable mode: window i is fetched + persisted right after
                # window i+1 is dispatched, so progress stays durable per
                # window while transfers and PNG writes overlap compute
                _flush_pending()
                pending = (s0, pasted)
            else:
                out_frames.append(pasted)
        _flush_pending()
        return np.concatenate([np.asarray(o) for o in out_frames], axis=0)

def _load_png01(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def swap_video_frames_multiface(
    pipe: VideoSwapPipeline,
    params,
    aux_params,
    frames01: np.ndarray,
    source01: np.ndarray,
    top_k: int = 2,
    score_threshold: float = 0.3,
    remove_classes=None,
) -> np.ndarray:
    """Multi-face extension (beyond the reference, which swaps exactly one
    face per frame): detect up to ``top_k`` faces with
    `vface_tpu.preprocess.detector.FaceDetector` (aux_params["detector"]),
    run the single-face pipeline on each face's landmark-aligned crop chain,
    and composite paste-backs in ascending score order (highest score lands
    on top). Faces below ``score_threshold`` are skipped.
    """
    from vface_tpu.preprocess.detector import FaceDetector, decode_detections

    det = FaceDetector()
    frames = jnp.asarray(frames01)
    heat, size, off = det.apply({"params": aux_params["detector"]}, frames)
    boxes, scores = decode_detections(
        heat, size, off, top_k=top_k, image_hw=frames.shape[1:3]
    )
    boxes_np = np.asarray(boxes)
    scores_np = np.asarray(scores)

    from vface_tpu.preprocess.detector import crop_boxes

    result = np.asarray(frames01).copy()
    s = pipe.opts.image_size
    # order faces by mean score ascending so the most confident composites last
    order = np.argsort(scores_np.mean(axis=0))
    for k in order:
        if scores_np[:, k].mean() < score_threshold:
            continue
        # localise: detect landmarks inside the k-th box crop, map back to
        # frame coordinates, and drive the single-face flow with them
        box_k = boxes[:, k]  # (F, 4) cx, cy, w, h
        crops_k = crop_boxes(frames, boxes, s)[:, k]  # (F, s, s, 3)
        lm_crop = pipe.detect_landmarks(aux_params, crops_k)  # (F, 68, 2) in crop px
        scale_xy = jnp.stack([box_k[:, 2], box_k[:, 3]], axis=-1) / s  # (F, 2)
        origin = jnp.stack(
            [box_k[:, 0] - box_k[:, 2] / 2, box_k[:, 1] - box_k[:, 3] / 2], axis=-1
        )
        lm_frame = lm_crop * scale_xy[:, None, :] + origin[:, None, :]
        result = pipe.swap_video_frames(
            params, aux_params, result, source01,
            remove_classes=remove_classes, frame_landmarks=lm_frame,
        )
    return result
