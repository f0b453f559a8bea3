#!/usr/bin/env python
"""Precompute BiSeNet masks for a dataset folder (FFHQ / CelebA / frames).

Capability parity with `/root/reference/REFace/esitmate_FFHQ_mask.py:1-90`
(FFHQ → BiSeNet_mask dir) and `process_CelebA_mask.py` (per-attribute
CelebAMask-HQ masks → Overall_mask index images): one batched jitted BiSeNet
pass per chunk instead of a frame-at-a-time host loop.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vface_tpu.utils.platform import apply_platform_from_env  # noqa: E402

apply_platform_from_env()

# CelebAMask-HQ per-attribute file suffix → class index (process_CelebA_mask.py)
CELEBA_ATTRS = [
    "skin", "l_brow", "r_brow", "l_eye", "r_eye", "eye_g", "l_ear", "r_ear",
    "ear_r", "nose", "mouth", "u_lip", "l_lip", "neck", "neck_l", "cloth",
    "hair", "hat",
]


def combine_celeba_masks(anno_dir: str, out_dir: str, count: int = 30000) -> int:
    """Merge per-attribute binary masks into Overall_mask index images."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    done = 0
    for i in range(count):
        sub = f"{i // 2000}"
        overall = None
        for ci, attr in enumerate(CELEBA_ATTRS, start=1):
            p = os.path.join(anno_dir, sub, f"{i:05d}_{attr}.png")
            if not os.path.exists(p):
                continue
            m = np.asarray(Image.open(p).convert("L")) > 127
            if overall is None:
                overall = np.zeros(m.shape, np.uint8)
            overall[m] = ci
        if overall is not None:
            Image.fromarray(overall).save(os.path.join(out_dir, f"{i}.png"))
            done += 1
    return done


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("bisenet", help="run BiSeNet over a folder of images")
    b.add_argument("--indir", required=True)
    b.add_argument("--outdir", required=True)
    b.add_argument("--params", default=None, help="npz BiSeNet params")
    b.add_argument("--batch", type=int, default=8)
    c = sub.add_parser("celeba", help="combine CelebAMask-HQ attribute masks")
    c.add_argument("--anno_dir", required=True)
    c.add_argument("--outdir", required=True)
    c.add_argument("--count", type=int, default=30000)
    args = ap.parse_args()

    if args.cmd == "celeba":
        n = combine_celeba_masks(args.anno_dir, args.outdir, args.count)
        print(f"combined {n} Overall_mask images into {args.outdir}")
        return

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from vface_tpu.models.bisenet import BiSeNet, parse_faces
    from vface_tpu.runtime.checkpoint import load_params_npz

    model = BiSeNet()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))["params"]
    if args.params:
        params = load_params_npz(args.params, params)

    os.makedirs(args.outdir, exist_ok=True)
    files = sorted(
        f for f in os.listdir(args.indir) if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    for s0 in range(0, len(files), args.batch):
        chunk = files[s0 : s0 + args.batch]
        imgs = jnp.stack(
            [
                jnp.asarray(
                    np.asarray(Image.open(os.path.join(args.indir, f)).convert("RGB"), np.float32)
                    / 255.0
                )
                for f in chunk
            ]
        )
        seg = np.asarray(parse_faces(params, imgs, model))
        for f, m in zip(chunk, seg):
            Image.fromarray(m.astype(np.uint8)).save(
                os.path.join(args.outdir, os.path.splitext(f)[0] + ".png")
            )
    print(f"wrote {len(files)} masks to {args.outdir}")


if __name__ == "__main__":
    main()
