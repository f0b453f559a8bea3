#!/usr/bin/env python
"""Combine CelebAMask-HQ per-attribute masks into `Overall_mask` index images.

Capability parity with `/root/reference/REFace/process_CelebA_mask.py`: for
each of the 30000 CelebA-HQ ids, the per-attribute binary masks
(`CelebA-HQ-mask/<i//2000>/{i:05d}_<attr>.png`, 512², 255 = attribute) are
merged into one 512² index image where pixel value = attribute index + 1 in
the fixed 18-attribute order (background stays 0). Later attributes overwrite
earlier ones on overlap, exactly as the reference's sequential assignment
does. Output: `Overall_mask/{i}.png` — the mask source of
`vface_tpu.data.datasets.CelebATrainDataset`.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

# 19 classes in total: skin=1, nose=2, ... cloth=18, background=0
# (process_CelebA_mask.py:19-23; class semantics at configs/train.yaml:146-147)
CELEBAHQ_LABEL_LIST = [
    "skin", "nose", "eye_g", "l_eye", "r_eye",
    "l_brow", "r_brow", "l_ear", "r_ear", "mouth",
    "u_lip", "l_lip", "hair", "hat", "ear_r",
    "neck_l", "neck", "cloth",
]


def combine_one(mask_root: str, i: int, size: int = 512) -> np.ndarray:
    """Merge id ``i``'s attribute masks → (size, size) uint8 index image."""
    mask = np.zeros((size, size), np.uint8)
    sub = os.path.join(mask_root, str(i // 2000))
    for ind, cate in enumerate(CELEBAHQ_LABEL_LIST):
        p = os.path.join(sub, f"{i:05d}_{cate}.png")
        if not os.path.exists(p):
            continue
        im = np.asarray(Image.open(p).convert("L"))
        mask[im == 255] = ind + 1
    return mask


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--mask_root",
        default="dataset/FaceData/CelebAMask-HQ/CelebA-HQ-mask",
        help="per-attribute mask tree (subdirs 0..14 of 2000 ids each)",
    )
    ap.add_argument("--out", default=None, help="default: <mask_root>/Overall_mask")
    ap.add_argument("--n", type=int, default=30000)
    args = ap.parse_args()

    out_dir = args.out or os.path.join(args.mask_root, "Overall_mask")
    os.makedirs(out_dir, exist_ok=True)
    for i in range(args.n):
        mask = combine_one(args.mask_root, i)
        Image.fromarray(mask).save(os.path.join(out_dir, f"{i}.png"))
        if i % 1000 == 0:
            print(f"[masks] {i}/{args.n}")
    print(f"[masks] wrote {args.n} combined masks to {out_dir}")


if __name__ == "__main__":
    main()
