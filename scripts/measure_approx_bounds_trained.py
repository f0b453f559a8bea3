#!/usr/bin/env python
"""Approx-lever OUTPUT-SPACE bounds on TRAINED weights (VERDICT r4 item 3a).

The pinned approx bound (1.87% rel-RMS z0 at encoder_interval=2) was measured
with perturbed-random flagship weights; encoder-feature reuse interacts with
weight structure, so this re-measures on the trained tiny bundle
(`scripts/train_synthetic_tiny.py` → 64², structured outputs) — and in
METRIC space, not just latent RMS: per lever and for the composed approx
operating point it reports, against the exact pipeline output on a synthetic
pan clip,

  * rel-RMS / PSNR on the final pasted frames (pixel space),
  * LPIPS(exact, approx) mean over frames,
  * ArcFace cosine(exact, approx) mean (identity drift of the approximation).

CAVEAT (recorded with the numbers): the LPIPS/ArcFace towers are random-init
in this environment (no trained eval checkpoints exist), so those two rows
bound the deviation through a random multi-scale feature metric, not the
calibrated perceptual/identity metrics. Pixel-space rows carry no caveat.

Levers: encoder_interval 2/3/4, background_res half, and the composed
candidates (i3+bg, i4+bg). `raft_iters` is excluded here: RAFT weights are
random in-env, so its bound is measured against ground-truth synthetic flow
once a trained flow net exists (see PLAN.md round-5).

Run: VFACE_PLATFORM=cpu python scripts/measure_approx_bounds_trained.py \
        --weights vface_tpu/weights/tiny_synth.npz
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


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", choices=("tiny", "mid"), default="tiny")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--motion", choices=("pan", "nonrigid"), default="pan",
                    help="nonrigid = expression/pose morph clip "
                         "(render_motion_sequence), the regime FGATS targets")
    args = ap.parse_args()
    mid = args.config == "mid"
    args.size = args.size or (128 if mid else 64)
    args.weights = args.weights or (
        "vface_tpu/weights/mid_synth.npz" if mid
        else "vface_tpu/weights/tiny_synth.npz"
    )

    import jax
    import jax.numpy as jnp

    from vface_tpu.models import ModelConfig, VFaceModel
    from vface_tpu.models.raft import RAFT, RAFTConfig
    from vface_tpu.pipelines.video_swap import SwapOptions, VideoSwapPipeline
    from vface_tpu.preprocess.synthetic_faces import (
        render_face,
        render_motion_sequence,
        render_pan_sequence,
    )
    from vface_tpu.runtime.checkpoint import load_params_npz

    size = args.size
    cfg_cls = ModelConfig.mid if mid else ModelConfig.tiny
    model = VFaceModel(cfg_cls(image_size=size))
    params = load_params_npz(args.weights, jax.jit(model.init)(jax.random.PRNGKey(0)))
    print(f"[bounds] trained bundle {args.weights} ({args.config} {size}², "
          f"{args.motion})", flush=True)

    hl = model.cfg.latent_size
    base = SwapOptions(
        ddim_steps=6, inversion_steps=6, window=4, image_size=size,
        parser_size=64, flow_tokens=hl * hl,
    )
    if args.motion == "nonrigid":
        frames, _, _ = render_motion_sequence(
            np.random.default_rng(3), args.frames, size,
            pose_amp=1.0, expr_amp=1.0,
        )
    else:
        frames, _ = render_pan_sequence(
            np.random.default_rng(3), args.frames, size, step_px=2.0
        )
    source, _ = render_face(np.random.default_rng(4), size)

    rng = jax.random.PRNGKey(1)
    raft = RAFT(RAFTConfig(iters=2))
    aux = None

    def run(opts):
        nonlocal aux
        pipe = VideoSwapPipeline(model, opts)
        pipe.raft = raft  # fixed flow net across variants (flow identical)
        if aux is None:
            aux = {
                "bisenet": pipe.bisenet.init(rng, jnp.zeros((1, 64, 64, 3)))["params"],
                "raft": pipe.raft.init(
                    rng, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3))
                )["params"],
                "landmark": pipe.landmark_net.init(
                    rng, jnp.zeros((1, 32, 32, 3))
                )["params"],
            }
        return np.asarray(pipe.swap_video_frames(params, aux, frames, source))

    # metric nets (random-init — see module docstring caveat)
    from vface_tpu.eval.lpips import LPIPS
    from vface_tpu.models.arcface import IRSE50

    lp = LPIPS()
    lp_params = lp.init(jax.random.PRNGKey(5), jnp.zeros((1, 64, 64, 3)),
                        jnp.zeros((1, 64, 64, 3)))["params"]
    af = IRSE50()
    af_params = af.init(jax.random.PRNGKey(6), jnp.zeros((1, 112, 112, 3)))["params"]

    def metrics(exact, approx):
        rms = float(np.sqrt(np.mean((approx - exact) ** 2)))
        rel = rms / max(float(np.sqrt(np.mean(exact**2))), 1e-9)
        psnr = float(20 * np.log10(1.0 / max(rms, 1e-9)))
        a = jnp.asarray(exact) * 2 - 1
        b = jnp.asarray(approx) * 2 - 1
        lpips = float(np.mean(np.asarray(lp.apply({"params": lp_params}, a, b))))
        # IRSE50 takes (B, 112, 112, 3) in [-1, 1]
        ea = af.apply({"params": af_params}, jax.image.resize(
            a, (exact.shape[0], 112, 112, 3), "bilinear"))
        eb = af.apply({"params": af_params}, jax.image.resize(
            b, (approx.shape[0], 112, 112, 3), "bilinear"))
        ea = ea / jnp.linalg.norm(ea, axis=-1, keepdims=True)
        eb = eb / jnp.linalg.norm(eb, axis=-1, keepdims=True)
        cos = float(np.mean(np.asarray(jnp.sum(ea * eb, axis=-1))))
        return dict(rel_rms=round(rel, 5), psnr_db=round(psnr, 2),
                    lpips_delta=round(lpips, 5), id_cosine=round(cos, 5))

    exact = run(base)
    table = {}
    variants = {
        "encoder_interval=2": dataclasses.replace(base, encoder_interval=2),
        "encoder_interval=3": dataclasses.replace(base, encoder_interval=3),
        "encoder_interval=4": dataclasses.replace(base, encoder_interval=4),
        "background_half": dataclasses.replace(base, background_res=size // 2),
        "composed_i3_bg": dataclasses.replace(
            base, encoder_interval=3, background_res=size // 2),
        "composed_i4_bg": dataclasses.replace(
            base, encoder_interval=4, background_res=size // 2),
    }
    for name, opts in variants.items():
        table[name] = metrics(exact, run(opts))
        print(json.dumps({name: table[name]}), flush=True)

    print(json.dumps(table))


if __name__ == "__main__":
    main()
