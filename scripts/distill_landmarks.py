#!/usr/bin/env python
"""Distil a 68-point landmark teacher into the batched LandmarkNet.

The reference's landmark source is dlib's C++ ERT cascade, called per frame
on the host inside the model forward (`/root/reference/REFace/ldm/models/
diffusion/ddpm.py:704-708, 1068-1099` — SURVEY hard part 2). The TPU-native
replacement is `vface_tpu.preprocess.landmarks.LandmarkNet`; this script
trains it against any teacher's outputs:

* a directory of images with a matching ``.npy`` of (N, 68, 2) landmarks
  (exported once from dlib/face-alignment on any host), or
* procedurally rendered photo-domain faces with exact 68-point ground truth
  (``--synthetic-faces``, `vface_tpu.preprocess.synthetic_faces` v2) — the
  in-environment supervision used to produce the shipped
  ``vface_tpu/weights/landmark_net.npz``, or
* random smoke data (--synthetic).

Loss: smooth-L1 on coordinates normalised by image size.

Tunneled-TPU efficiency: the dataset rides to the device ONCE as uint8 and
training runs as chunked `lax.scan` programs (one remote dispatch per
``--chunk`` steps) — per-step host dispatch over the tunnel would dominate
otherwise. The distilled weights drop into every pipeline via
aux_params["landmark"].
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


def load_data(args):
    if args.synthetic_faces:
        from vface_tpu.preprocess.synthetic_faces import render_batch

        if args.cache and os.path.exists(args.cache):
            d = np.load(args.cache)
            if d["images"].shape[0] == args.n_data and d["images"].shape[1] == args.size:
                print(f"[distill] loaded cached dataset {args.cache}", flush=True)
                return d["images"], d["lms"]
        data_rng = np.random.default_rng(0)
        t0 = time.perf_counter()
        images, lms = render_batch(data_rng, args.n_data, args.size)
        print(f"[distill] rendered {args.n_data} faces in {time.perf_counter()-t0:.1f}s",
              flush=True)
        images = np.clip(images * 255.0, 0, 255).astype(np.uint8)
        if args.cache:
            np.savez(args.cache, images=images, lms=lms)
        return images, lms
    elif args.synthetic:
        n = 256
        data_rng = np.random.default_rng(0)
        images = data_rng.uniform(0, 1, (n, args.size, args.size, 3)).astype(np.float32)
        lms = data_rng.uniform(0.2, 0.8, (n, 68, 2)).astype(np.float32) * args.size
    else:
        from PIL import Image

        files = sorted(
            f for f in os.listdir(args.images) if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        lms = np.load(args.landmarks).astype(np.float32)
        images = np.stack(
            [
                np.asarray(
                    Image.open(os.path.join(args.images, f)).convert("RGB").resize(
                        (args.size, args.size)
                    ),
                    np.float32,
                )
                / 255.0
                for f in files[: len(lms)]
            ]
        )
    return np.clip(images * 255.0, 0, 255).astype(np.uint8), lms


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--images", help="image dir")
    ap.add_argument("--landmarks", help=".npy of (N, 68, 2) teacher landmarks")
    ap.add_argument("--synthetic", action="store_true", help="random smoke data")
    ap.add_argument(
        "--synthetic-faces", action="store_true",
        help="procedurally rendered faces with exact 68-pt ground truth",
    )
    ap.add_argument("--n_data", type=int, default=8192, help="synthetic-faces dataset size")
    ap.add_argument("--cache", default="", help="npz path to cache the rendered dataset")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--chunk", type=int, default=250, help="scan steps per device dispatch")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", default="landmark_net.npz")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from vface_tpu.preprocess.landmarks import LandmarkNet
    from vface_tpu.runtime.checkpoint import save_params_npz

    net = LandmarkNet(detect_size=args.size)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(net.init)(rng, jnp.zeros((1, args.size, args.size, 3)))["params"]
    sched = optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.02)
    opt = optax.adam(sched)
    opt_state = opt.init(params)

    images, lms = load_data(args)
    n = len(images)
    # dataset lives on-device as uint8 (args.n_data x size² x 3 ≈ 1.6 GB at
    # the defaults); labels in heat-grid units (stride-8 cells, corner
    # convention matching LandmarkNet's px mapping lm_grid * (size / grid))
    grid = args.size // 8
    ds_u8 = jax.device_put(images)
    ds_lm = jax.device_put(lms.astype(np.float32) * (grid / args.size))
    del images

    # heatmap supervision: per-channel softmax cross-entropy against a
    # normalized Gaussian (sigma = 1 cell) placed at the GT cell — trains the
    # logit landscape that decode_heatmaps's argmax + local soft-argmax reads
    ys = jnp.arange(grid, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(ys, ys, indexing="ij")
    yy_f = yy.reshape(-1)  # (grid²,)
    xx_f = xx.reshape(-1)

    def one_step(ds_u8, ds_lm, carry, idx):
        params, opt_state = carry
        imgs = ds_u8[idx].astype(jnp.float32) / 255.0
        tgt = ds_lm[idx]  # (B, 68, 2) grid units

        d2 = (
            (xx_f[None, :, None] - tgt[:, None, :, 0]) ** 2
            + (yy_f[None, :, None] - tgt[:, None, :, 1]) ** 2
        )  # (B, grid², 68)
        tdist = jax.nn.softmax(-0.5 * d2, axis=1)  # sigma = 1 cell

        def loss_fn(p):
            heat = net.apply({"params": p}, imgs, method=net.heatmaps)
            b = heat.shape[0]
            logp = jax.nn.log_softmax(
                heat.reshape(b, grid * grid, 68).astype(jnp.float32), axis=1
            )
            return -jnp.mean(jnp.sum(tdist * logp, axis=1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    @jax.jit
    def run_chunk(params, opt_state, idx_chunk, ds_u8, ds_lm):
        (params, opt_state), losses = jax.lax.scan(
            lambda c, i: one_step(ds_u8, ds_lm, c, i), (params, opt_state), idx_chunk
        )
        return params, opt_state, jnp.mean(losses)

    order_rng = np.random.default_rng(1)
    t0 = time.perf_counter()
    done = 0
    while done < args.steps:
        k = min(args.chunk, args.steps - done)
        idx = order_rng.integers(0, n, (k, args.batch)).astype(np.int32)
        params, opt_state, loss = run_chunk(params, opt_state, jnp.asarray(idx), ds_u8, ds_lm)
        done += k
        print(
            f"[distill] step {done}/{args.steps} loss {float(loss):.5f} "
            f"({time.perf_counter()-t0:.0f}s)",
            flush=True,
        )

    if args.synthetic_faces:
        from vface_tpu.preprocess.synthetic_faces import render_batch as _rb

        ev_imgs, ev_lms = _rb(np.random.default_rng(99), 64, args.size)
        pred = np.asarray(
            jax.jit(lambda p, x: net.apply({"params": p}, x))(params, jnp.asarray(ev_imgs))
        )
        err = float(np.mean(np.linalg.norm(pred - ev_lms, axis=-1)))
        print(f"[distill] held-out mean landmark error: {err:.2f} px @ {args.size}px")
    save_params_npz(args.out, jax.device_get(params))
    print(f"saved LandmarkNet weights to {args.out}")


if __name__ == "__main__":
    main()
