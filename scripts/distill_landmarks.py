#!/usr/bin/env python
"""Distil a 68-point landmark teacher into the batched LandmarkNet.

The reference's landmark source is dlib's C++ ERT cascade, called per frame
on the host inside the model forward (`/root/reference/REFace/ldm/models/
diffusion/ddpm.py:704-708, 1068-1099` — SURVEY hard part 2). The TPU-native
replacement is `vface_tpu.preprocess.landmarks.LandmarkNet`; this script
trains it against any teacher's outputs:

* a directory of images with a matching ``.npy`` of (N, 68, 2) landmarks
  (exported once from dlib/face-alignment on any host), or
* procedurally rendered faces with exact 68-point ground truth
  (``--synthetic-faces``, `vface_tpu.preprocess.synthetic_faces`) — the
  in-environment supervision used to produce the shipped
  ``vface_tpu/weights/landmark_net.npz``, or
* random smoke data (--synthetic).

Loss: smooth-L1 on coordinates normalised by image size. The distilled
weights drop into every pipeline via aux_params["landmark"].
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
    ap.add_argument("--images", help="image dir")
    ap.add_argument("--landmarks", help=".npy of (N, 68, 2) teacher landmarks")
    ap.add_argument("--synthetic", action="store_true", help="random smoke data")
    ap.add_argument(
        "--synthetic-faces", action="store_true",
        help="procedurally rendered faces with exact 68-pt ground truth",
    )
    ap.add_argument("--n_data", type=int, default=4096, help="synthetic-faces dataset size")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", default="landmark_net.npz")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from vface_tpu.preprocess.landmarks import LandmarkNet
    from vface_tpu.runtime.checkpoint import save_params_npz

    net = LandmarkNet()
    rng = jax.random.PRNGKey(0)
    params = net.init(rng, jnp.zeros((1, args.size, args.size, 3)))["params"]
    sched = optax.cosine_decay_schedule(args.lr, args.steps, alpha=0.02)
    opt = optax.adam(sched)
    opt_state = opt.init(params)

    if args.synthetic_faces:
        from vface_tpu.preprocess.synthetic_faces import render_batch

        data_rng = np.random.default_rng(0)
        import time

        t0 = time.perf_counter()
        images, lms = render_batch(data_rng, args.n_data, args.size)
        print(f"[distill] rendered {args.n_data} faces in {time.perf_counter()-t0:.1f}s")
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

    @jax.jit
    def step(params, opt_state, imgs, targets):
        def loss_fn(p):
            pred = net.apply({"params": p}, imgs) / args.size
            tgt = targets / args.size
            return jnp.mean(optax.huber_loss(pred, tgt, delta=0.01))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    n = len(images)
    order_rng = np.random.default_rng(1)
    for it in range(args.steps):
        idx = order_rng.integers(0, n, args.batch)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(images[idx]), jnp.asarray(lms[idx])
        )
        if it % 100 == 0:
            print(f"[distill] step {it} loss {float(loss):.5f}")
    if args.synthetic_faces:
        from vface_tpu.preprocess.synthetic_faces import render_batch as _rb

        ev_imgs, ev_lms = _rb(np.random.default_rng(99), 64, args.size)
        pred = np.asarray(
            jax.jit(lambda p, x: net.apply({"params": p}, x))(params, jnp.asarray(ev_imgs))
        )
        err = float(np.mean(np.linalg.norm(pred - ev_lms, axis=-1)))
        print(f"[distill] held-out mean landmark error: {err:.2f} px @ {args.size}px")
    save_params_npz(args.out, params)
    print(f"saved LandmarkNet weights to {args.out}")


if __name__ == "__main__":
    main()
