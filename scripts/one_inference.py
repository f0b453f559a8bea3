#!/usr/bin/env python
"""Single source→target image swap with align + paste-back (the Demo.sh flow).

Capability parity with `/root/reference/REFace/scripts/one_inference.py`
(:816, paste-back at :788-789) and `inference_swap_selected.py` when given
folders (:463-489): align both faces, swap with the 2-chunk CFG DDIM,
composite the swapped crop back into the original target through the inverse
perspective transform.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vface_tpu.utils.platform import apply_platform_from_env  # noqa: E402

apply_platform_from_env()


def _load(path, size=None):
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if size:
        img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


def swap_one(pipe, model, params, aux_params, target01, source01, opts):
    """Shared core for single-pair and folder modes. Returns full-frame result."""
    import jax.numpy as jnp

    from vface_tpu.models.clip import clip_preprocess
    from vface_tpu.pipelines.image_swap import swap_image_batch
    from vface_tpu.preprocess.align import paste_back
    from vface_tpu.preprocess.landmarks import landmarks_to_vector
    from vface_tpu.preprocess.masks import TRAIN_REMOVE, inpaint_inputs

    tar = jnp.asarray(target01)[None]
    src = jnp.asarray(source01)[None]
    tar_crop, inv_coeffs = pipe.align_crops(aux_params, tar)
    src_crop, _ = pipe.align_crops(aux_params, src)
    seg = pipe.parse_masks(aux_params, tar_crop)
    _, keep = inpaint_inputs(tar_crop * 2 - 1, seg, TRAIN_REMOVE)
    src_seg = pipe.parse_masks(aux_params, src_crop)
    _, src_keep = inpaint_inputs(src_crop * 2 - 1, src_seg, TRAIN_REMOVE)
    src_face = src_crop * (1 - src_keep)
    src_clip = clip_preprocess(src_face, model.cfg.cond.clip.image_size)
    lms = landmarks_to_vector(pipe.detect_landmarks(aux_params, tar_crop))
    swapped = swap_image_batch(
        model, params, tar_crop * 2 - 1, keep, src_clip, src_crop, lms, opts
    )
    bg = pipe.decode_with_background(params, tar * 2 - 1)
    return np.asarray(paste_back(bg, swapped, inv_coeffs, 1.0 - keep))[0]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--target", required=True, help="target image OR folder")
    ap.add_argument("--source", required=True, help="source image OR folder")
    ap.add_argument("--out", default="swapped.png", help="output image OR folder")
    ap.add_argument("--params", default=None)
    ap.add_argument("--ddim_steps", type=int, default=50)
    ap.add_argument("--scale", type=float, default=3.5)  # inference_selected.sh
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument(
        "--watermark", action="store_true",
        help="embed the invisible watermark in outputs (the legacy "
        "inference.py put_watermark capability, inference.py:78, 413)",
    )
    ap.add_argument(
        "--safety_params", default=None,
        help="npz of SafetyChecker params; flagged outputs are blacked out "
        "(check_safety, inference.py:97-101)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from vface_tpu.models import ModelConfig, VFaceModel
    from vface_tpu.pipelines.image_swap import ImageSwapOptions
    from vface_tpu.pipelines.video_swap import SwapOptions, VideoSwapPipeline
    from vface_tpu.runtime.checkpoint import load_params_npz

    cfg = ModelConfig.tiny(image_size=32) if args.tiny else ModelConfig.sd_v1_inpaint()
    model = VFaceModel(cfg)
    params = model.init(jax.random.PRNGKey(args.seed))
    if args.params:
        params = load_params_npz(args.params, params)
    pipe = VideoSwapPipeline(
        model,
        SwapOptions(image_size=cfg.image_size, parser_size=64 if args.tiny else 512),
    )
    rng = jax.random.PRNGKey(args.seed + 1)
    s = cfg.image_size
    aux_params = {
        "bisenet": pipe.bisenet.init(rng, jnp.zeros((1, 64, 64, 3)))["params"],
        "landmark": pipe.landmark_net.init(rng, jnp.zeros((1, s, s, 3)))["params"],
    }
    opts = ImageSwapOptions(args.ddim_steps, args.scale, cfg.image_size)

    safety = None
    if args.safety_params:
        from vface_tpu.utils.watermark import SafetyChecker

        safety = (SafetyChecker(cfg.cond.clip), dict(np.load(args.safety_params)))

    def finalize(out01: np.ndarray) -> np.ndarray:
        if safety is not None:
            checker, sp = safety
            # nested clip tree rides as flat npz keys clip/<path>
            clip_tree: dict = {}
            from vface_tpu.utils.torch_convert import set_path

            for k, v in sp.items():
                set_path(clip_tree, k, v)
            checked, flagged = checker.check(clip_tree, out01[None])
            if flagged[0]:
                print("[safety] potential unsafe content — output blacked out")
            out01 = checked[0]
        u8 = (np.clip(out01, 0, 1) * 255).astype(np.uint8)
        if args.watermark:
            from vface_tpu.utils.watermark import embed_watermark

            u8 = embed_watermark(u8)
        return u8

    if os.path.isdir(args.target):
        # folder × folder: every source onto every target (inference_swap_selected.py)
        os.makedirs(args.out, exist_ok=True)
        tars = sorted(os.listdir(args.target))
        srcs = sorted(os.listdir(args.source))
        for t in tars:
            for sname in srcs:
                out01 = swap_one(
                    pipe, model, params, aux_params,
                    _load(os.path.join(args.target, t)),
                    _load(os.path.join(args.source, sname)),
                    opts,
                )
                oname = f"{os.path.splitext(sname)[0]}_to_{os.path.splitext(t)[0]}.png"
                Image.fromarray(finalize(out01)).save(os.path.join(args.out, oname))
                print(f"[done] {oname}")
    else:
        out01 = swap_one(
            pipe, model, params, aux_params, _load(args.target), _load(args.source), opts
        )
        Image.fromarray(finalize(out01)).save(args.out)
        print(f"[done] {args.out}")


if __name__ == "__main__":
    main()
