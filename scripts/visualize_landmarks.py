#!/usr/bin/env python
"""Render the shipped LandmarkNet's predictions on the reference's real
example photos into one committed artifact grid.

For each photo in `/root/reference/REFace/examples/FaceSwap/Source/` the
panel shows the 68 predicted landmarks (green), the eye/mouth centroids
(red), and the derived FFHQ alignment quad (yellow — the crop geometry the
whole pipeline uses, `alignmengt.py:148-178` semantics).

Output: docs/landmarks_real_faces.png (grid, one panel per photo).

Run: VFACE_PLATFORM=cpu python scripts/visualize_landmarks.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vface_tpu.utils.platform import apply_platform_from_env  # noqa: E402

apply_platform_from_env()

EXAMPLES = "/root/reference/REFace/examples/FaceSwap/Source"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "landmarks_real_faces.png")
PANEL = 256


def _draw_disk(img, x, y, r, color):
    h, w = img.shape[:2]
    x0, x1 = max(0, int(x - r)), min(w, int(x + r + 1))
    y0, y1 = max(0, int(y - r)), min(h, int(y + r + 1))
    if x0 >= x1 or y0 >= y1:
        return
    yy, xx = np.mgrid[y0:y1, x0:x1]
    m = (xx - x) ** 2 + (yy - y) ** 2 <= r * r
    img[y0:y1, x0:x1][m] = color


def _draw_line(img, p0, p1, color):
    n = int(np.hypot(*(np.asarray(p1) - p0))) * 2 + 2
    for t in np.linspace(0.0, 1.0, n):
        x, y = (1 - t) * np.asarray(p0) + t * np.asarray(p1)
        _draw_disk(img, x, y, 1, color)


def main():
    from PIL import Image

    import jax.numpy as jnp

    from vface_tpu.preprocess.align import compute_quad
    from vface_tpu.preprocess.landmarks import LandmarkNet, load_default_landmark_params

    params = load_default_landmark_params()
    if params is None:
        sys.exit("no shipped landmark_net.npz")
    net = LandmarkNet()

    panels = []
    for name in sorted(os.listdir(EXAMPLES)):
        im = Image.open(os.path.join(EXAMPLES, name)).convert("RGB")
        img = np.asarray(im, np.float32) / 255.0
        lm = np.asarray(net.apply({"params": params}, jnp.asarray(img)[None]))[0]
        quad = np.asarray(compute_quad(jnp.asarray(lm)[None])[0])[0]

        # draw at native resolution, then downsample the panel
        vis = img.copy()
        r = max(2, int(0.004 * max(img.shape[:2])))
        for x, y in lm:
            _draw_disk(vis, x, y, r, (0.1, 1.0, 0.2))
        for c in (lm[36:48].mean(axis=0), lm[48:68].mean(axis=0)):
            _draw_disk(vis, c[0], c[1], r * 2, (1.0, 0.15, 0.1))
        for i in range(4):
            _draw_line(vis, quad[i], quad[(i + 1) % 4], (1.0, 0.9, 0.1))

        p = Image.fromarray((np.clip(vis, 0, 1) * 255).astype(np.uint8))
        p.thumbnail((PANEL, PANEL))
        canvas = Image.new("RGB", (PANEL, PANEL), (24, 24, 24))
        canvas.paste(p, ((PANEL - p.width) // 2, (PANEL - p.height) // 2))
        panels.append(np.asarray(canvas))
        print(f"[viz] {name}: eye span "
              f"{lm[42:48].mean(0)[0] - lm[36:42].mean(0)[0]:.0f} px", flush=True)

    cols = 4
    rows = (len(panels) + cols - 1) // cols
    grid = np.full((rows * PANEL, cols * PANEL, 3), 24, np.uint8)
    for i, p in enumerate(panels):
        rr, cc = divmod(i, cols)
        grid[rr * PANEL:(rr + 1) * PANEL, cc * PANEL:(cc + 1) * PANEL] = p
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    Image.fromarray(grid).save(OUT)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
