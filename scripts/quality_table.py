#!/usr/bin/env python
"""The framework's first TRAINED-WEIGHT end-to-end quality table
(VERDICT r4 next-item 2): swap synthetic identities on NON-RIGID motion
clips with the trained bundle, FGATS off / on / +carry (+ the composed
approx operating point), and measure quality on every in-env axis.

Metric grounding (no trained external checkpoints exist in this
environment — each row states its basis):
  * warp_error      — GROUND TRUTH: the renderer's pose flow
                      (`preprocess.synthetic_faces.motion_pair_flow`),
                      face-hull-masked. The temporal-consistency axis the
                      reference's FGATS exists for (temporal_flow.py:223-237).
  * pose_err        — GROUNDED via the TRAINED LandmarkNet (shipped weights,
                      distilled on this renderer domain): eye-line angle of
                      detected output landmarks vs the renderer's GT θ track.
  * expr_err        — GROUNDED likewise: normalized mouth-opening of output
                      landmarks vs the target clip's GT track (the
                      expression-preservation axis, Deep3DFaceRecon analog).
  * skin_dist       — GROUNDED: mean face-hull color of the output vs the
                      SOURCE face's hull color (identity-transfer direction).
  * tl_id / tg_id / id_top1 / fid — measured through RANDOM-INIT
                      IRSE50 / InceptionV3 towers (fixed feature spaces;
                      relative comparisons only — calibrated values need
                      real checkpoints; recorded with that caveat).

Run (chip): VFACE_PLATFORM= python scripts/quality_table.py \
    --weights vface_tpu/weights/mid_synth.npz --config mid
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vface_tpu.utils.platform import apply_platform_from_env  # noqa: E402

apply_platform_from_env()


def face_hull_mask(lm: np.ndarray, size: int) -> np.ndarray:
    from PIL import Image, ImageDraw

    hull = np.concatenate([lm[0:17], lm[26:16:-1]], axis=0)
    im = Image.new("L", (size, size), 0)
    ImageDraw.Draw(im).polygon([tuple(p) for p in hull.tolist()], fill=255)
    return np.asarray(im, np.float32) / 255.0


def eyeline_angle(lm: np.ndarray) -> float:
    """Angle of the eye-center line (radians) — the in-plane pose readout."""
    left = lm[36:42].mean(axis=0)
    right = lm[42:48].mean(axis=0)
    d = right - left
    return float(np.arctan2(d[1], d[0]))


def mouth_gap(lm: np.ndarray) -> float:
    """Inner-lip opening normalized by eye distance (expression readout)."""
    gap = np.linalg.norm(lm[66] - lm[62])
    eye = np.linalg.norm(lm[42:48].mean(axis=0) - lm[36:42].mean(axis=0))
    return float(gap / max(eye, 1e-6))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights", default="vface_tpu/weights/mid_synth.npz")
    ap.add_argument("--config", choices=("tiny", "mid"), default="mid")
    ap.add_argument("--pairs", type=int, default=4)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--window", type=int, default=4)
    ap.add_argument("--out", default="docs/quality_table.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vface_tpu.eval.fid import compute_fid
    from vface_tpu.eval.id_retrieval import embed_faces, id_retrieval
    from vface_tpu.eval.temporal import evaluate_temporal, warp_error
    from vface_tpu.models import InjectionSpec, ModelConfig, VFaceModel
    from vface_tpu.models.raft import RAFT, RAFTConfig
    from vface_tpu.ops.attention import FusionConfig
    from vface_tpu.pipelines.video_swap import SwapOptions, VideoSwapPipeline
    from vface_tpu.preprocess.landmarks import load_default_landmark_params
    from vface_tpu.preprocess.synthetic_faces import (
        motion_pair_flow,
        render_face,
        render_motion_sequence,
    )
    from vface_tpu.runtime.checkpoint import load_params_npz

    cfg_cls = ModelConfig.mid if args.config == "mid" else ModelConfig.tiny
    model = VFaceModel(cfg_cls())
    size = model.cfg.image_size
    params = load_params_npz(args.weights, jax.jit(model.init)(jax.random.PRNGKey(0)))
    print(f"[quality] bundle {args.weights} size {size}", flush=True)

    hl = model.cfg.latent_size
    base = SwapOptions(
        ddim_steps=args.steps, inversion_steps=args.steps, window=args.window,
        image_size=size, parser_size=64, flow_tokens=hl * hl,
    )
    variants = {
        "fgats_off": (base, "fft"),
        "fgats": (base, "flow_fix"),
        "carry": (dataclasses.replace(base, cross_window_carry=True), "flow_fix"),
        "approx_i3_bg": (
            dataclasses.replace(base, encoder_interval=3,
                                background_res=size // 2),
            "flow_fix",
        ),
    }

    rng0 = jax.random.PRNGKey(1)
    raft = RAFT(RAFTConfig(iters=2))

    # eval towers (random-init where no trained weights exist — see docstring)
    from vface_tpu.eval.fid import InceptionV3Pool3
    from vface_tpu.models.arcface import IRSE50

    inception = InceptionV3Pool3()
    inc_params = inception.init(jax.random.PRNGKey(7), jnp.zeros((1, 299, 299, 3)))["params"]
    arc = IRSE50()
    arc_params = arc.init(jax.random.PRNGKey(8), jnp.zeros((1, 112, 112, 3)))["params"]
    lm_params = load_default_landmark_params()

    # test pairs: non-rigid target clips + held-out source identities
    clips = []
    for i in range(args.pairs):
        r = np.random.default_rng(100 + i)
        frames, lms, poses = render_motion_sequence(
            r, args.frames, size, pose_amp=1.0, expr_amp=1.0
        )
        source, src_lm = render_face(np.random.default_rng(500 + i), size)
        clips.append(dict(frames=frames, lms=lms, poses=poses,
                          source=source, src_lm=src_lm))

    # renderer-dataset sample for the FID reference distribution
    ds_imgs = np.stack([
        render_face(np.random.default_rng(900 + i), size)[0]
        for i in range(64)
    ])

    pipe0 = VideoSwapPipeline(model, base)
    aux = {
        "bisenet": pipe0.bisenet.init(rng0, jnp.zeros((1, 64, 64, 3)))["params"],
        "raft": raft.init(
            rng0, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3))
        )["params"],
        "landmark": lm_params if lm_params is not None else
        pipe0.landmark_net.init(rng0, jnp.zeros((1, size, size, 3)))["params"],
    }

    def detect_lm(pipe, frames01):
        return np.asarray(pipe.detect_landmarks(aux, jnp.asarray(frames01)))

    table = {}
    outputs_by_variant = {}
    for name, (opts, mode) in variants.items():
        pipe = VideoSwapPipeline(model, opts)
        pipe.raft = raft
        pipe.injection = InjectionSpec(
            input_blocks=FusionConfig(
                mode, split_ratio=opts.split_ratio, flow_alpha=opts.flow_alpha,
                flow_tokens=opts.flow_tokens,
            ),
            chunks=3,
        )
        rows = []
        outs = []
        for ci, clip in enumerate(clips):
            out = np.asarray(pipe.swap_video_frames(
                params, aux, clip["frames"], clip["source"]
            ))
            outs.append(out)
            # GT pose flow + face-hull mask for warp error
            flows = np.stack([
                motion_pair_flow(clip["poses"][j], clip["poses"][j + 1], size)
                for j in range(args.frames - 1)
            ])
            masks = np.stack([
                face_hull_mask(clip["lms"][j], size) for j in range(args.frames)
            ])[..., None]
            werr = warp_error(jnp.asarray(out), jnp.asarray(flows),
                              mask=jnp.asarray(masks))
            t = evaluate_temporal(arc_params, out, model=arc)
            out_lm = detect_lm(pipe, out)
            pose_err = float(np.mean([
                abs(eyeline_angle(out_lm[j]) - eyeline_angle(clip["lms"][j]))
                for j in range(args.frames)
            ]))
            expr_err = float(np.mean([
                abs(mouth_gap(out_lm[j]) - mouth_gap(clip["lms"][j]))
                for j in range(args.frames)
            ]))
            hull_src = face_hull_mask(clip["src_lm"], size)
            hull_out = np.stack([
                face_hull_mask(out_lm[j], size) for j in range(args.frames)
            ])
            src_color = (clip["source"] * hull_src[..., None]).sum((0, 1)) / max(
                hull_src.sum(), 1.0
            )
            out_color = (out * hull_out[..., None]).sum((1, 2)) / np.maximum(
                hull_out.sum((1, 2)), 1.0
            )[:, None]
            tar_color = np.stack([
                (clip["frames"][j] * face_hull_mask(clip["lms"][j], size)[..., None]).sum((0, 1))
                / max(face_hull_mask(clip["lms"][j], size).sum(), 1.0)
                for j in range(args.frames)
            ])
            skin_src = float(np.linalg.norm(out_color - src_color, axis=-1).mean())
            skin_tar = float(np.linalg.norm(out_color - tar_color, axis=-1).mean())
            rows.append(dict(
                warp_error=float(werr), tl_id=t["tl_id"], tg_id=t["tg_id"],
                pose_err=pose_err, expr_err=expr_err,
                skin_dist_src=skin_src, skin_dist_tar=skin_tar,
            ))
        agg = {k: round(float(np.mean([r[k] for r in rows])), 5) for k in rows[0]}
        # distribution + retrieval metrics over ALL pairs' frames
        all_out = np.concatenate(outs)
        agg["fid_rand"] = round(float(compute_fid(inc_params, all_out, ds_imgs)), 3)
        gal = np.stack([c["source"] for c in clips])
        per_frame_ids = np.repeat(np.arange(args.pairs), args.frames)
        emb_out = embed_faces(arc_params, all_out)
        emb_gal = embed_faces(arc_params, gal)
        r = id_retrieval(emb_out, emb_gal, per_frame_ids)
        agg["id_top1_rand"] = round(float(r.get("top1", 0.0)), 4)
        table[name] = agg
        outputs_by_variant[name] = outs[0]
        print(json.dumps({name: agg}), flush=True)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(table, f, indent=1)
    # artifact strip: target / source / each variant's frame row for pair 0
    from PIL import Image

    rows_img = [clips[0]["frames"], ]
    for name in variants:
        rows_img.append(outputs_by_variant[name])
    strip = np.concatenate(
        [np.concatenate(list(r), axis=1) for r in rows_img], axis=0
    )
    Image.fromarray((np.clip(strip, 0, 1) * 255).astype(np.uint8)).save(
        os.path.splitext(args.out)[0] + ".png"
    )
    print(f"[quality] wrote {args.out} (+.png)", flush=True)


if __name__ == "__main__":
    main()
