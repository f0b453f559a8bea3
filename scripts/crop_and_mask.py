#!/usr/bin/env python
"""Align faces + produce parsing masks for a folder of images.

Capability parity with `/root/reference/REFace/Crop_and_mask.py` (standalone
CLI: dlib align → 1024² crops + BiSeNet masks) using the framework's batched
landmark/alignment/parsing stack.
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
    ap.add_argument("--indir", required=True)
    ap.add_argument("--outdir", default="cropped")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--aux_params", default=None)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from vface_tpu.models.bisenet import BiSeNet, parse_faces
    from vface_tpu.preprocess.align import compute_quad, quad_crop
    from vface_tpu.preprocess.landmarks import LandmarkNet
    from vface_tpu.runtime.checkpoint import load_params_npz

    lm_net = LandmarkNet()
    parser = BiSeNet()
    rng = jax.random.PRNGKey(0)
    aux = {
        "landmark": lm_net.init(rng, jnp.zeros((1, args.size, args.size, 3)))["params"],
        "bisenet": parser.init(rng, jnp.zeros((1, 64, 64, 3)))["params"],
    }
    if args.aux_params:
        aux = load_params_npz(args.aux_params, aux)

    os.makedirs(os.path.join(args.outdir, "crops"), exist_ok=True)
    os.makedirs(os.path.join(args.outdir, "masks"), exist_ok=True)
    files = sorted(
        f for f in os.listdir(args.indir) if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    for s0 in range(0, len(files), args.batch):
        chunk = files[s0 : s0 + args.batch]
        imgs = jnp.stack(
            [
                jnp.asarray(
                    np.asarray(
                        Image.open(os.path.join(args.indir, f)).convert("RGB"), np.float32
                    )
                    / 255.0
                )
                for f in chunk
            ]
        )
        lm = lm_net.apply({"params": aux["landmark"]}, imgs)
        quad, _ = compute_quad(lm)
        crops = quad_crop(imgs, quad, args.size)
        seg = parse_faces(aux["bisenet"], crops, parser)
        seg = jax.image.resize(seg, (len(chunk), args.size, args.size), method="nearest")
        for f, c, m in zip(chunk, np.asarray(crops), np.asarray(seg)):
            stem = os.path.splitext(f)[0]
            Image.fromarray((np.clip(c, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(args.outdir, "crops", stem + ".png")
            )
            Image.fromarray(m.astype(np.uint8)).save(
                os.path.join(args.outdir, "masks", stem + ".png")
            )
    print(f"processed {len(files)} images into {args.outdir}")


if __name__ == "__main__":
    main()
