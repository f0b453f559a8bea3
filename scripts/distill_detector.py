#!/usr/bin/env python
"""Distill `FaceDetector` weights from multi-face synthetic scenes.

The reference detects one face per frame with dlib's HOG+SVM
(`/root/reference/REFace/src/utils/alignmengt.py:39-81`); our TPU-native
replacement is an anchor-free center-heatmap net
(`vface_tpu.preprocess.detector.FaceDetector`).  No dlib teacher exists
in-environment, so supervision comes from the photo-domain scene renderer
(`vface_tpu.preprocess.synthetic_faces.render_scene`: 1-4 non-overlapping
faces over cluttered backgrounds, exact box GT from the landmark geometry).

Targets (standard CenterNet):
* heatmap — a Gaussian splat per face center (sigma = box size / 6),
  penalty-reduced focal loss (alpha 2, beta 4);
* size — log-parameterized w/h at the center cell (the net emits softplus
  pre-activations), masked L1;
* offset — sub-cell center remainder at the center cell, masked L1.

Tunneled-TPU efficiency: dataset rides to the device once as uint8; training
runs as chunked `lax.scan` programs (one remote dispatch per ``--chunk``
steps).

Run: VFACE_PLATFORM= python scripts/distill_detector.py --out vface_tpu/weights/detector.npz
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vface_tpu.utils.platform import apply_platform_from_env  # noqa: E402

apply_platform_from_env()

STRIDE = 8

# Real-photo training mix (round-4): face patches from the reference's
# example photos composited onto synthetic backgrounds. elon / oscar-isaac /
# 10092 are deliberately EXCLUDED — they are the held-out identities
# tests/test_detector_real_faces.py validates on (no train/test circularity).
REAL_DIR = "/root/reference/REFace/examples/FaceSwap/Source"
TRAIN_REAL_BOXES = {
    "will_smith.jpeg": (1700, 300, 3350, 2400),
    "yanlecun.jpeg": (370, 70, 520, 260),
    "10075-00.png": (150, 150, 920, 1024),
    "10076-00.png": (180, 100, 870, 1024),
}


def load_real_patches(side: int = 160):
    """[(patch01 (side, side, 3), (cx, cy, fw, fh) face box in patch px)]."""
    from PIL import Image

    out = []
    for name, (x0, y0, x1, y1) in TRAIN_REAL_BOXES.items():
        path = os.path.join(REAL_DIR, name)
        if not os.path.exists(path):
            continue
        im = Image.open(path).convert("RGB")
        w, h = x1 - x0, y1 - y0
        mx, my = 0.3 * w, 0.3 * h
        box = (max(0, int(x0 - mx)), max(0, int(y0 - my)),
               min(im.width, int(x1 + mx)), min(im.height, int(y1 + my)))
        patch = im.crop(box).resize((side, side), Image.BILINEAR)
        cx = ((x0 + x1) / 2 - box[0]) / (box[2] - box[0]) * side
        cy = ((y0 + y1) / 2 - box[1]) / (box[3] - box[1]) * side
        fw = w / (box[2] - box[0]) * side
        fh = h / (box[3] - box[1]) * side
        out.append((np.asarray(patch, np.float32) / 255.0, (cx, cy, fw, fh)))
    return out


def render_scene_real(rng: np.random.Generator, size: int, patches,
                      max_faces: int = 4):
    """Composite 1-3 real face patches (flip/scale/photometric-jittered) on a
    synthetic background; GT boxes mapped from the hand annotations."""
    from vface_tpu.preprocess.synthetic_faces import _background

    s = size
    yy, xx = np.meshgrid(np.arange(s, dtype=np.float32),
                         np.arange(s, dtype=np.float32), indexing="ij")
    img = _background(rng, s, xx, yy)
    n = int(rng.integers(1, 4))
    boxes = np.zeros((max_faces, 4), np.float32)
    valid = np.zeros((max_faces,), bool)
    placed = []
    from PIL import Image

    for i in range(n):
        patch, (cx, cy, fw, fh) = patches[int(rng.integers(len(patches)))]
        side = int(rng.uniform(0.16, 0.55) * s)
        for _ in range(12):
            px = int(rng.uniform(0, s - side))
            py = int(rng.uniform(0, s - side))
            c = (px + side / 2, py + side / 2)
            if all(np.hypot(c[0] - q[0], c[1] - q[1]) > 0.75 * (side + q[2])
                   for q in placed):
                break
        else:
            continue
        placed.append((c[0], c[1], side))
        p = patch
        if rng.random() < 0.5:
            p = p[:, ::-1]
            cx = p.shape[1] - 1 - cx
        p = np.asarray(
            Image.fromarray((p * 255).astype(np.uint8)).resize(
                (side, side), Image.BILINEAR
            ), np.float32) / 255.0
        # photometric jitter: gain/bias per channel + mild gamma
        gain = rng.uniform(0.75, 1.2, (1, 1, 3))
        bias = rng.uniform(-0.08, 0.08, (1, 1, 3))
        p = np.clip(p ** rng.uniform(0.8, 1.25) * gain + bias, 0, 1)
        img[py : py + side, px : px + side] = p
        k = side / patch.shape[0]
        boxes[i] = (px + cx * k, py + cy * k, fw * k, fh * k)
        valid[i] = True
    from vface_tpu.preprocess.synthetic_faces import _photometrics

    return _photometrics(img, rng, xx, yy), boxes, valid


def build_targets(boxes: np.ndarray, valid: np.ndarray, size: int):
    """(N, K, 4) [cx, cy, w, h] px + (N, K) valid → heat (N, h, w, 1),
    size_t (N, h, w, 2) (pre-softplus px/stride), off_t (N, h, w, 2),
    mask (N, h, w, 1)."""
    n, k, _ = boxes.shape
    h = w = size // STRIDE
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    heat = np.zeros((n, h, w, 1), np.float32)
    size_t = np.zeros((n, h, w, 2), np.float32)
    off_t = np.zeros((n, h, w, 2), np.float32)
    mask = np.zeros((n, h, w, 1), np.float32)
    for i in range(n):
        for j in range(k):
            if not valid[i, j]:
                continue
            cx, cy, bw, bh = boxes[i, j] / STRIDE
            sigma = max(1.0, (bw + bh) / 12.0)
            ix, iy = int(np.clip(cx, 0, w - 1)), int(np.clip(cy, 0, h - 1))
            # gaussian centred on the INT cell (CenterNet): the peak cell is
            # exactly 1, so it is unambiguously the positive for the focal
            # loss (a fractional-centre gaussian peaks below 1 and a
            # `heat >= 0.999` positive test silently drops faces)
            g = np.exp(-((xs - ix) ** 2 + (ys - iy) ** 2) / (2 * sigma**2))
            heat[i, :, :, 0] = np.maximum(heat[i, :, :, 0], g)
            size_t[i, iy, ix] = (bw, bh)
            off_t[i, iy, ix] = (cx - ix, cy - iy)
            mask[i, iy, ix, 0] = 1.0
    return heat, size_t, off_t, mask


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n_data", type=int, default=6144)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--chunk", type=int, default=250)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", default="detector.npz")
    ap.add_argument("--real_mix", type=float, default=0.35,
                    help="fraction of scenes compositing REAL face patches "
                         "(train identities only; 0 reproduces the r3 recipe)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from vface_tpu.preprocess.detector import FaceDetector, decode_detections
    from vface_tpu.preprocess.synthetic_faces import render_scene
    from vface_tpu.runtime.checkpoint import save_params_npz

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    patches = load_real_patches() if args.real_mix > 0 else []
    if args.real_mix > 0 and not patches:
        print("[detector] WARNING: real_mix requested but no photos found",
              flush=True)
    scenes, boxes, valids = [], [], []
    for _ in range(args.n_data):
        if patches and rng.random() < args.real_mix:
            img, bx, vl = render_scene_real(rng, args.size, patches)
        else:
            img, bx, vl = render_scene(rng, args.size)
        scenes.append(np.clip(img * 255.0, 0, 255).astype(np.uint8))
        boxes.append(bx)
        valids.append(vl)
    scenes = np.stack(scenes)
    boxes = np.stack(boxes)
    valids = np.stack(valids)
    print(f"[detector] rendered {args.n_data} scenes in {time.perf_counter()-t0:.1f}s",
          flush=True)
    heat_t, size_t, off_t, mask_t = build_targets(boxes, valids, args.size)

    net = FaceDetector(detect_size=args.size)
    params = jax.jit(net.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, args.size, args.size, 3))
    )["params"]
    sched = optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.02)
    opt = optax.adam(sched)
    opt_state = opt.init(params)

    ds = dict(
        img=jax.device_put(scenes),
        heat=jax.device_put(heat_t),
        size=jax.device_put(size_t),
        off=jax.device_put(off_t),
        mask=jax.device_put(mask_t),
    )

    def one_step(ds, carry, idx):
        params, opt_state = carry
        imgs = ds["img"][idx].astype(jnp.float32) / 255.0
        ht, st, ot, mk = ds["heat"][idx], ds["size"][idx], ds["off"][idx], ds["mask"][idx]

        def loss_fn(p):
            heat, size, off = net.apply({"params": p}, imgs)
            heat = jnp.clip(heat, 1e-5, 1.0 - 1e-5)
            pos = mk  # positives = the size/offset cells, same set
            # penalty-reduced focal loss (CenterNet eq. 1)
            l_pos = -pos * (1 - heat) ** 2 * jnp.log(heat)
            l_neg = -(1 - pos) * (1 - ht) ** 4 * heat**2 * jnp.log(1 - heat)
            n_pos = jnp.maximum(jnp.sum(pos), 1.0)
            l_heat = (jnp.sum(l_pos) + jnp.sum(l_neg)) / n_pos
            # size/offset: match the decoder's parameterization exactly
            # (decode does softplus(size_head) * stride)
            l_size = jnp.sum(mk * jnp.abs(jax.nn.softplus(size) - st)) / n_pos
            l_off = jnp.sum(mk * jnp.abs(off - ot)) / n_pos
            return l_heat + 0.3 * l_size + l_off

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    @jax.jit
    def run_chunk(params, opt_state, idx_chunk, ds):
        (params, opt_state), losses = jax.lax.scan(
            lambda c, i: one_step(ds, c, i), (params, opt_state), idx_chunk
        )
        return params, opt_state, jnp.mean(losses)

    order_rng = np.random.default_rng(1)
    t0 = time.perf_counter()
    done = 0
    while done < args.steps:
        k = min(args.chunk, args.steps - done)
        idx = order_rng.integers(0, args.n_data, (k, args.batch)).astype(np.int32)
        params, opt_state, loss = run_chunk(params, opt_state, jnp.asarray(idx), ds)
        done += k
        print(f"[detector] step {done}/{args.steps} loss {float(loss):.4f} "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)

    # held-out eval: recall / center error on fresh scenes
    ev_rng = np.random.default_rng(123)
    n_ev, hit, tot, cerr = 64, 0, 0, []
    ev_imgs, ev_boxes, ev_valid = [], [], []
    for _ in range(n_ev):
        img, bx, vl = render_scene(ev_rng, args.size)
        ev_imgs.append(img)
        ev_boxes.append(bx)
        ev_valid.append(vl)
    heat, size, off = jax.jit(lambda p, x: net.apply({"params": p}, x))(
        params, jnp.asarray(np.stack(ev_imgs))
    )
    dets, scores = decode_detections(heat, size, off, top_k=4)
    dets, scores = np.asarray(dets), np.asarray(scores)
    for i in range(n_ev):
        for j in range(4):
            if not ev_valid[i][j]:
                continue
            tot += 1
            gt = ev_boxes[i][j]
            d = np.linalg.norm(dets[i, :, :2] - gt[:2], axis=-1)
            best = int(np.argmin(d))
            if d[best] < 0.5 * max(gt[2], gt[3]) and scores[i, best] > 0.3:
                hit += 1
                cerr.append(d[best])
    print(f"[detector] held-out recall {hit}/{tot} = {hit/max(tot,1):.3f}, "
          f"center err {np.mean(cerr) if cerr else -1:.2f} px", flush=True)

    save_params_npz(args.out, jax.device_get(params))
    print(f"saved FaceDetector weights to {args.out}")


if __name__ == "__main__":
    main()
