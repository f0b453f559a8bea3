#!/usr/bin/env python
"""Batch video face-swap driver — the `VFace_inference_batch.py` CLI.

Capability parity with `/root/reference/REFace/scripts/VFace_inference_batch.py`
(:672-910) + `VFace_video_swap_batch.sh`: pair target videos with source
images from a YAML config (see `scripts/generate_config.py`), run the VFace
pipeline per video, and write swapped videos (AVI/Y4M + GIF). Idempotent:
completed videos (and completed windows within a video, via the progress
manifest) are skipped on re-run, like the reference's output-dir skip
(:889-891) and latent caches (:529-543).

Inputs are Y4M videos or directories of `{i}.png` frames (the reference's
precomputed-frames layout, `ldm/data/video_swap_dataset.py`).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vface_tpu.utils.platform import apply_platform_from_env  # noqa: E402

apply_platform_from_env()


def load_frames(path: str):
    from vface_tpu.io.video import read_y4m

    if path.endswith(".y4m"):
        frames, fps = read_y4m(path)
        return frames.astype(np.float32) / 255.0, fps
    # frame directory 0.png..N.png
    from PIL import Image

    files = sorted(
        (f for f in os.listdir(path) if f.endswith(".png")),
        key=lambda f: int(os.path.splitext(f)[0]),
    )
    frames = np.stack(
        [np.asarray(Image.open(os.path.join(path, f)).convert("RGB"), np.float32) / 255.0
         for f in files]
    )
    return frames, 10


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True, help="YAML: [{video:..., source:...}]")
    ap.add_argument("--outdir", default="results/video_swap")
    ap.add_argument("--params", default=None, help="npz params snapshot (else random init)")
    ap.add_argument("--aux_params", default=None, help="npz aux nets snapshot")
    ap.add_argument("--ddim_steps", type=int, default=50)
    ap.add_argument(
        "--inversion_steps", type=int, default=50,
        help="fixed 50 in the reference regardless of --ddim_steps (:502)",
    )
    ap.add_argument("--scale", type=float, default=3.0)
    ap.add_argument("--n_frames", type=int, default=6, help="window size")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--fps", type=int, default=10)
    ap.add_argument("--tiny", action="store_true", help="tiny config smoke mode")
    ap.add_argument(
        "--mesh_data", type=int, default=0,
        help="shard full windows over an N-device data mesh "
        "(swap_windows_batched; 0 = sequential single-device loop)",
    )
    ap.add_argument(
        "--mesh_frames", type=int, default=0,
        help="LATENCY path: shard each window's frames over an N-device mesh "
        "(flow-on FGATS via the ppermute halo, parallel/frame_sharded.py). "
        "Use when chips >= windows. Eligibility: recon-free operating point, "
        "no --cross_window_carry, --batch_windows 1, window divisible by N. "
        "Mutually exclusive with --mesh_data",
    )
    ap.add_argument(
        "--batch_windows", type=int, default=1,
        help="pack N consecutive windows into one device program (bit-equal "
        "to separate windows via boundary-masked FGATS; higher throughput)",
    )
    ap.add_argument(
        "--cross_window_carry", action="store_true",
        help="EXPERIMENTAL: FGATS carry across window boundaries (beyond the "
        "reference; targets the per-window temporal seam; sequential mode "
        "only. Mechanism is test-pinned but its benefit is unproven at "
        "random weights — needs trained checkpoints)",
    )
    args = ap.parse_args()

    import jax
    from PIL import Image

    from vface_tpu.io.video import write_avi, write_gif, write_y4m
    from vface_tpu.models import ModelConfig, VFaceModel
    from vface_tpu.pipelines.video_swap import SwapOptions, VideoSwapPipeline
    from vface_tpu.runtime.checkpoint import VideoProgressManifest, load_params_npz
    from vface_tpu.utils.config import load_yaml

    cfg = ModelConfig.tiny(image_size=32) if args.tiny else ModelConfig.sd_v1_inpaint()
    model = VFaceModel(cfg)
    params = model.init(jax.random.PRNGKey(args.seed))
    if args.params:
        params = load_params_npz(args.params, params)

    opts = SwapOptions(
        ddim_steps=args.ddim_steps,
        inversion_steps=args.inversion_steps,
        cfg_scale=args.scale,
        window=args.n_frames,
        image_size=cfg.image_size,
        parser_size=64 if args.tiny else 512,
        fps=args.fps,
        cross_window_carry=args.cross_window_carry,
        batch_windows=args.batch_windows,
    )
    pipe = VideoSwapPipeline(model, opts)
    rng = jax.random.PRNGKey(args.seed + 1)
    import jax.numpy as jnp

    aux_params = {
        "bisenet": pipe.bisenet.init(rng, jnp.zeros((1, 64, 64, 3)))["params"],
        "raft": pipe.raft.init(
            rng, jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
        )["params"],
        "landmark": pipe.landmark_net.init(
            rng, jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
        )["params"],
    }
    if args.aux_params:
        aux_params = load_params_npz(args.aux_params, aux_params)
    else:
        # shipped distilled LandmarkNet weights (synthetic-face teacher) —
        # random landmark init produces meaningless crops
        from vface_tpu.preprocess.landmarks import load_default_landmark_params

        lm_params = load_default_landmark_params()
        if lm_params is not None:
            aux_params["landmark"] = lm_params

    mesh = frame_mesh = None
    if args.mesh_data and args.mesh_frames:
        ap.error("--mesh_data and --mesh_frames are mutually exclusive")
    if args.mesh_data:
        from vface_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=args.mesh_data)
    elif args.mesh_frames:
        from vface_tpu.parallel.mesh import make_mesh

        frame_mesh = make_mesh(n_data=args.mesh_frames)

    pairs = load_yaml(args.config)
    os.makedirs(args.outdir, exist_ok=True)
    for pair in pairs:
        name = os.path.splitext(os.path.basename(pair["video"]))[0]
        out_base = os.path.join(args.outdir, name)
        if os.path.exists(out_base + ".avi"):
            print(f"[skip] {name}: output exists")
            continue
        manifest = VideoProgressManifest(
            out_base + ".manifest.json",
            meta={
                "window": opts.window,
                "ddim_steps": opts.ddim_steps,
                "inversion_steps": opts.inversion_steps,
                "cfg_scale": opts.cfg_scale,
                "image_size": opts.image_size,
                "seed": args.seed,
            },
        )
        frame_dir = out_base + "_frames"
        os.makedirs(frame_dir, exist_ok=True)

        def window_sink(s0, pasted01):
            # durable per-window outputs: a preempted run resumes by skipping
            # completed windows (reference latent-cache idempotency, :529-543)
            paths = []
            for j, fr in enumerate(pasted01):
                p = os.path.join(frame_dir, f"{s0 + j}.png")
                Image.fromarray((np.clip(fr, 0, 1) * 255).astype(np.uint8)).save(p)
                paths.append(p)
            return paths

        try:
            frames01, fps = load_frames(pair["video"])
            source01 = np.asarray(
                Image.open(pair["source"]).convert("RGB"), np.float32
            ) / 255.0
            # precomputed-mask mode (reference crop_and_mask → mask dirs,
            # video_swap_dataset.py:86-409): `masks:` = dir of {i}.png parse
            # maps per frame → the in-pipeline BiSeNet parse is skipped
            frame_keep = None
            if pair.get("masks"):
                from vface_tpu.data.datasets import _load_mask
                from vface_tpu.preprocess.masks import TRAIN_REMOVE, region_mask

                m = np.stack([
                    _load_mask(os.path.join(pair["masks"], f"{i}.png"),
                               opts.image_size)
                    for i in range(len(frames01))
                ])
                face = np.asarray(region_mask(jnp.asarray(m), TRAIN_REMOVE))
                frame_keep = (1.0 - face)[..., None].astype(np.float32)
            if mesh is not None:
                swapped = pipe.swap_video_frames_sharded(
                    params, aux_params, frames01, source01, mesh,
                    manifest=manifest, window_sink=window_sink,
                    frame_keep=frame_keep,
                )
            elif frame_mesh is not None:
                if frame_keep is not None:
                    raise ValueError(
                        "--mesh_frames does not support precomputed masks: "
                        "drop the pair's `masks:` key or use --mesh_data"
                    )
                swapped = pipe.swap_video_frames_frame_sharded(
                    params, aux_params, frames01, source01, frame_mesh,
                )
            else:
                swapped = pipe.swap_video_frames(
                    params, aux_params, frames01, source01,
                    manifest=manifest, window_sink=window_sink,
                    frame_keep=frame_keep,
                )
            u8 = (np.clip(swapped, 0, 1) * 255).astype(np.uint8)
            # audio passthrough (reference muxes the source audio,
            # VFace_inference_batch.py:646-666): a `.wav` side file next to
            # the video (or an explicit `audio:` key in the pair) is
            # interleaved into the output AVI
            audio = sr = None
            wav = pair.get("audio") or os.path.splitext(pair["video"])[0] + ".wav"
            if os.path.exists(wav):
                from vface_tpu.io.video import read_wav

                audio, sr = read_wav(wav)
            write_avi(out_base + ".avi", u8, fps=args.fps, audio=audio,
                      sample_rate=sr or 0)
            write_y4m(out_base + ".y4m", u8, fps=args.fps)
            write_gif(out_base + ".gif", u8, fps=args.fps)
            # per-window completion is recorded by window_sink inside the
            # pipeline; no whole-video mark (it would clobber window 0's
            # frame list and break resume)
            print(f"[done] {name}: {len(u8)} frames")
        except Exception as e:  # per-video skip, like the reference (:905-906)
            print(f"[fail] {name}: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
