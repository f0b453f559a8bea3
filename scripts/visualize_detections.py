#!/usr/bin/env python
"""Render docs/detector_real_faces.png: the shipped FaceDetector on the
held-out real-photo composites (tests/test_detector_real_faces.py scenes).

GT face boxes in green, detections (score > 0.3) in red with scores.

Run: VFACE_PLATFORM=cpu python scripts/visualize_detections.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np

from vface_tpu.utils.platform import apply_platform_from_env

apply_platform_from_env()

import jax
import jax.numpy as jnp


def main():
    from PIL import Image, ImageDraw

    from test_detector_real_faces import SCENES, composite_scene, det_params
    from vface_tpu.preprocess.detector import FaceDetector, decode_detections

    net = FaceDetector()
    imgs, gts = [], []
    for i, sc in enumerate(SCENES):
        img, gt = composite_scene(sc, seed=i)
        imgs.append(img)
        gts.append(gt)
    heat, size, off = jax.jit(lambda p, x: net.apply({"params": p}, x))(
        det_params, jnp.asarray(np.stack(imgs))
    )
    dets, scores = decode_detections(heat, size, off, top_k=4, image_hw=(256, 256))
    dets, scores = np.asarray(dets), np.asarray(scores)

    canvas = Image.new("RGB", (len(imgs) * 262 + 2, 266), "black")
    for i, img in enumerate(imgs):
        im = Image.fromarray((img * 255).astype(np.uint8))
        dr = ImageDraw.Draw(im)
        for cx, cy, fw, fh in gts[i]:
            dr.rectangle([cx - fw / 2, cy - fh / 2, cx + fw / 2, cy + fh / 2],
                         outline=(0, 255, 0), width=2)
        for k in range(dets.shape[1]):
            if scores[i, k] <= 0.3:
                continue
            cx, cy, fw, fh = dets[i, k]
            dr.rectangle([cx - fw / 2, cy - fh / 2, cx + fw / 2, cy + fh / 2],
                         outline=(255, 60, 60), width=2)
            dr.text((cx - fw / 2 + 2, cy - fh / 2 + 2), f"{scores[i,k]:.2f}",
                    fill=(255, 60, 60))
        canvas.paste(im, (i * 262 + 2, 5))
    out = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "detector_real_faces.png")
    canvas.save(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
