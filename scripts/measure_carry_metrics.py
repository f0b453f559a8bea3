#!/usr/bin/env python
"""Cross-window FGATS carry: mechanism-level temporal metrics.

Round-2 VERDICT item 8: the carry mechanism (chaining attention q/k across
window boundaries — beyond the reference, whose 6-frame windows are smoothed
independently, SURVEY §5) is pinned by tests but was never *measured*. No
trained checkpoints exist in this environment, so this script measures the
mechanism with PERTURBED random weights (per-leaf independent noise — the
zero-init out-conv makes unperturbed init vacuous) on a synthetic pan clip:

* clip: one rendered face panning ``step_px`` per frame → ground-truth flow
  is a constant shift, so the warp error needs no flow estimator;
* swap the clip with ``cross_window_carry`` off vs on (window 4, 12 frames →
  2 window boundaries) at a tiny config with FGATS engaged
  (``flow_tokens`` lowered to the tiny ds1 token count);
* report the overall warp error and the boundary-pair warp error (frame
  pairs straddling a window boundary — the seam the carry exists to remove).

Usage: VFACE_PLATFORM=cpu python scripts/measure_carry_metrics.py
"""

from __future__ import annotations

import os
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vface_tpu.utils.platform import apply_platform_from_env  # noqa: E402

apply_platform_from_env()


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights", default=None,
                    help="npz bundle from scripts/train_synthetic_tiny.py — "
                    "measure with TRAINED weights instead of perturbed init")
    ap.add_argument("--size", type=int, default=None,
                    help="model image size (default 32; trained bundle uses 64)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vface_tpu.models import ModelConfig, VFaceModel
    from vface_tpu.models.raft import RAFT, RAFTConfig
    from vface_tpu.pipelines.video_swap import SwapOptions, VideoSwapPipeline
    from vface_tpu.preprocess.synthetic_faces import render_face, render_pan_sequence

    size = args.size or (64 if args.weights else 32)
    model = VFaceModel(ModelConfig.tiny(image_size=size))
    params = jax.jit(model.init)(jax.random.PRNGKey(0))

    if args.weights:
        from vface_tpu.runtime.checkpoint import load_params_npz

        params = load_params_npz(args.weights, params)
        print(f"[carry] loaded trained bundle {args.weights}", flush=True)
    else:
        def perturb(path, x):
            if not jnp.issubdtype(x.dtype, jnp.floating):
                return x
            key = jax.random.fold_in(
                jax.random.PRNGKey(7), zlib.crc32(jax.tree_util.keystr(path).encode())
            )
            return x + 0.03 * jax.random.normal(key, x.shape, x.dtype)

        params = jax.tree_util.tree_map_with_path(perturb, params)

    hl = model.cfg.latent_size
    base = SwapOptions(
        ddim_steps=6, inversion_steps=6, window=4, image_size=size,
        parser_size=64, flow_tokens=hl * hl,
    )

    n_frames, step_px = 12, 2.0
    frames, _ = render_pan_sequence(np.random.default_rng(3), n_frames, 64, step_px=step_px)
    source, _ = render_face(np.random.default_rng(4), 64)

    rng = jax.random.PRNGKey(1)
    results = {}
    outs = {}
    # three variants: FGATS OFF (fft-only injection), FGATS on, FGATS+carry —
    # the off/on pair measures the flow smoothing itself (the reference's
    # headline temporal feature), the on/carry pair the cross-window carry
    for variant in ("no_flow", False, True):
        carry = variant is True
        import dataclasses

        pipe = VideoSwapPipeline(model, dataclasses.replace(base, cross_window_carry=carry))
        if variant == "no_flow":
            from vface_tpu.models import InjectionSpec
            from vface_tpu.ops.attention import FusionConfig

            pipe.injection = InjectionSpec(
                input_blocks=FusionConfig("fft", split_ratio=base.split_ratio)
            )
        pipe.raft = RAFT(RAFTConfig(iters=2))
        aux = {
            "bisenet": pipe.bisenet.init(rng, jnp.zeros((1, 64, 64, 3)))["params"],
            "raft": pipe.raft.init(
                rng, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3))
            )["params"],
            "landmark": pipe.landmark_net.init(rng, jnp.zeros((1, 32, 32, 3)))["params"],
        }
        out = np.asarray(pipe.swap_video_frames(params, aux, frames, source))
        outs[variant] = out

        # warp error vs the KNOWN pan: out[t+1] shifted back by step must
        # match out[t]; restrict to the valid overlap columns
        s = int(step_px)
        pair_err = np.abs(out[1:, :, : 64 - s] - out[:-1, :, s:]).mean(axis=(1, 2, 3))
        boundary_pairs = [base.window - 1 + k * base.window for k in range((n_frames - 1) // base.window)]
        b_idx = [i for i in boundary_pairs if i < len(pair_err)]
        w_idx = [i for i in range(len(pair_err)) if i not in b_idx]
        results[variant] = dict(
            warp_all=float(pair_err.mean()),
            warp_boundary=float(pair_err[b_idx].mean()),
            warp_within=float(pair_err[w_idx].mean()),
        )

    print(f"{'variant':>8} | {'warp all':>9} | {'boundary pairs':>14} | {'within-window':>13}")
    for variant in ("no_flow", False, True):
        r = results[variant]
        name = {"no_flow": "fgats-off", False: "fgats", True: "carry"}[variant]
        print(
            f"{name:>8} | {r['warp_all']:9.5f} | {r['warp_boundary']:14.5f} | {r['warp_within']:13.5f}"
        )
    fd = results["no_flow"]["warp_all"] - results[False]["warp_all"]
    print(
        f"FGATS warp-error delta (off−on): {fd:+.5f} "
        f"({100*fd/max(results['no_flow']['warp_all'],1e-9):+.1f}%)"
    )
    delta = results[False]["warp_boundary"] - results[True]["warp_boundary"]
    print(
        f"boundary warp-error delta (off−on): {delta:+.5f} "
        f"({100*delta/max(results[False]['warp_boundary'],1e-9):+.1f}%)"
    )
    # sanity: carry must not change within-window smoothing
    wd = abs(results[False]["warp_within"] - results[True]["warp_within"])
    print(f"within-window delta (should be ~0): {wd:.6f}")


if __name__ == "__main__":
    main()
