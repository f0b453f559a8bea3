#!/usr/bin/env python
"""Square-crop ground-truth images for FID (reference scripts/create_square_gt_for_fid.py)."""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--indir", required=True)
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    n = 0
    for f in sorted(os.listdir(args.indir)):
        if not f.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        img = Image.open(os.path.join(args.indir, f)).convert("RGB")
        w, h = img.size
        s = min(w, h)
        img = img.crop(((w - s) // 2, (h - s) // 2, (w + s) // 2, (h + s) // 2))
        img.resize((args.size, args.size), Image.BILINEAR).save(
            os.path.join(args.outdir, os.path.splitext(f)[0] + ".png")
        )
        n += 1
    print(f"wrote {n} square GT images to {args.outdir}")


if __name__ == "__main__":
    main()
