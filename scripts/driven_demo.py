#!/usr/bin/env python
"""Driven comparison videos via the face-vid2vid generator.

Capability parity with `/root/reference/REFace/eval_tool/face_vid2vid/
driven_demo_video.py:182-263`: animate a (swapped) source portrait with the
motion of a driving video — used to produce side-by-side comparison videos
for the qualitative eval.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vface_tpu.utils.platform import apply_platform_from_env  # noqa: E402

apply_platform_from_env()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", required=True, help="portrait image")
    ap.add_argument("--driving", required=True, help="driving video (.y4m or frame dir)")
    ap.add_argument("--out", default="driven.avi")
    ap.add_argument("--params", default=None, help="npz generator weights")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--fps", type=int, default=10)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from vface_tpu.io.video import read_y4m, write_avi
    from vface_tpu.models.face_vid2vid import FV2VConfig, OcclusionAwareGenerator
    from vface_tpu.runtime.checkpoint import load_params_npz

    cfg = FV2VConfig.tiny() if args.tiny else FV2VConfig()
    size = cfg.image_size if args.tiny else args.size
    gen = OcclusionAwareGenerator(cfg)

    src = np.asarray(
        Image.open(args.source).convert("RGB").resize((size, size)), np.float32
    ) / 255.0
    if args.driving.endswith(".y4m"):
        frames, _ = read_y4m(args.driving)
        frames = frames.astype(np.float32) / 255.0
    else:
        files = sorted(f for f in os.listdir(args.driving) if f.endswith(".png"))
        frames = np.stack(
            [
                np.asarray(
                    Image.open(os.path.join(args.driving, f)).convert("RGB"), np.float32
                )
                / 255.0
                for f in files
            ]
        )
    f = frames.shape[0]
    frames = jax.image.resize(jnp.asarray(frames), (f, size, size, 3), method="bilinear")

    params = gen.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), jnp.zeros((1, size, size, 3))
    )["params"]
    if args.params:
        params = load_params_npz(args.params, params)

    run = jax.jit(lambda p, s, d: gen.apply({"params": p}, s, d))
    src_b = jnp.asarray(src)[None]
    outs = []
    for i in range(f):
        outs.append(np.asarray(run(params, src_b, frames[i : i + 1]))[0])
    out_u8 = (np.clip(np.stack(outs), 0, 1) * 255).astype(np.uint8)
    write_avi(args.out, out_u8, fps=args.fps)
    print(f"[done] {args.out}: {f} frames")


if __name__ == "__main__":
    main()
