#!/usr/bin/env python
"""Train a SMALL diffusion bundle on synthetic faces — carry/FGATS leverage.

Round-3 VERDICT item 9: the cross-window FGATS carry (and FGATS quality
claims generally) cannot show non-noise temporal deltas at random weights.
No real checkpoints exist in-environment, so this trains the tiny
topology-faithful bundle (`ModelConfig.tiny(image_size=64)`) on the
photo-domain synthetic face renderer (`preprocess.synthetic_faces` — the
same renderer that distilled the landmark/detector nets):

  phase 1 — the tiny KL-VAE as a plain autoencoder (L1 + tiny KL), so
            encode/decode are image-like rather than random projections;
  phase 2 — the LDM eps-model through the PRODUCTION train step
            (`pipelines.train.make_train_step`, reconstruct=False,
            ID/LPIPS weights 0 — ArcFace/CLIP towers are untrained tiny
            stand-ins) on self-supervised inpainting pairs built exactly
            like CelebATrainDataset (keep = 1 − face-hull mask,
            inpaint = gt·keep, reference = face crop).

Weights → vface_tpu/weights/tiny_synth.npz (the whole bundle);
scripts/measure_carry_metrics.py --weights consumes them.

Run: VFACE_PLATFORM= python scripts/train_synthetic_tiny.py
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


def face_hull_mask(lm: np.ndarray, size: int) -> np.ndarray:
    """(68, 2) landmarks → float keep mask (1 − filled face hull), (S, S)."""
    from PIL import Image, ImageDraw

    hull = np.concatenate([lm[0:17], lm[26:16:-1]], axis=0)  # jaw + brows
    im = Image.new("L", (size, size), 0)
    ImageDraw.Draw(im).polygon([tuple(p) for p in hull.tolist()], fill=255)
    face = np.asarray(im, np.float32) / 255.0
    return 1.0 - face


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", choices=("tiny", "mid"), default="tiny",
                    help="mid = ModelConfig.mid (41.6M params, 128², /4 "
                    "latent) — the round-5 quality-loop bundle")
    ap.add_argument("--n_data", type=int, default=None)
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--vae_steps", type=int, default=None)
    ap.add_argument("--ldm_steps", type=int, default=None)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--recon_steps", type=int, default=None,
                    help="phase 3: continue with the FULL production loss "
                    "(train-time DDIM reconstruction + masked ID loss, "
                    "ddpm.py:1696-1797) so identity transfer gets a training "
                    "signal (the ID net is the frozen random-init tiny "
                    "ArcFace — a fixed feature space, not a calibrated one)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    mid = args.config == "mid"
    args.size = args.size or (128 if mid else 64)
    args.n_data = args.n_data or (2048 if mid else 1536)
    args.vae_steps = args.vae_steps or (4000 if mid else 3000)
    args.ldm_steps = args.ldm_steps or (10000 if mid else 6000)
    if args.recon_steps is None:
        args.recon_steps = 2000 if mid else 0
    args.out = args.out or (
        "vface_tpu/weights/mid_synth.npz" if mid
        else "vface_tpu/weights/tiny_synth.npz"
    )

    import jax
    import jax.numpy as jnp
    import optax

    from vface_tpu.models import ModelConfig, VFaceModel
    from vface_tpu.models.clip import clip_preprocess
    from vface_tpu.pipelines.train import TrainConfig, make_optimizer, make_train_step
    from vface_tpu.preprocess.synthetic_faces import landmark_face_box, render_face
    from vface_tpu.runtime.checkpoint import save_params_npz

    s = args.size
    cfg_cls = ModelConfig.mid if mid else ModelConfig.tiny
    model = VFaceModel(cfg_cls(image_size=s))
    clip_sz = model.cfg.cond.clip.image_size

    # ---------------- dataset ----------------
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    gts, keeps, refs_clip, refs_face, lms = [], [], [], [], []
    for _ in range(args.n_data):
        img01, lm = render_face(rng, s)
        keep = face_hull_mask(lm, s)[..., None]
        box = landmark_face_box(lm)
        cx, cy, bw, bh = box
        half = 0.7 * max(bw, bh)
        x0, x1 = int(max(0, cx - half)), int(min(s, cx + half))
        y0, y1 = int(max(0, cy - half)), int(min(s, cy + half))
        crop = img01[max(y0, 0) : max(y1, 1), max(x0, 0) : max(x1, 1)]
        if crop.size == 0:
            crop = img01
        from PIL import Image

        crop_im = Image.fromarray((crop * 255).astype(np.uint8))
        ref_c = np.asarray(crop_im.resize((clip_sz, clip_sz), Image.BILINEAR),
                           np.float32) / 255.0
        ref_f = np.asarray(crop_im.resize((112, 112), Image.BILINEAR),
                           np.float32) / 255.0
        gts.append(img01 * 2.0 - 1.0)
        keeps.append(keep)
        refs_clip.append(ref_c)
        refs_face.append(ref_f)
        lms.append(lm.reshape(-1))
    print(f"[synth] rendered {args.n_data} faces in {time.perf_counter()-t0:.1f}s",
          flush=True)

    gt = jnp.asarray(np.stack(gts), jnp.float32)
    keep = jnp.asarray(np.stack(keeps), jnp.float32)
    ref_clip = jnp.asarray(clip_preprocess(jnp.asarray(np.stack(refs_clip)), size=clip_sz))
    ref_face = jnp.asarray(np.stack(refs_face), jnp.float32)
    lmv = jnp.asarray(np.stack(lms), jnp.float32)

    params = jax.jit(model.init)(jax.random.PRNGKey(0))

    # ---------------- phase 1: VAE autoencoder ----------------
    vae = model.vae

    def vae_loss(vp, x, rng_):
        post = vae.apply({"params": vp}, x, method=vae.encode)
        z = post.sample(rng_)
        rec = vae.apply({"params": vp}, z, method=vae.decode)
        return jnp.mean(jnp.abs(rec - x)) + 1e-6 * jnp.mean(post.kl())

    vtx = optax.adam(1e-3)
    vstate = vtx.init(params["vae"])

    def vae_chunk_impl(vp, st, key, idxs, gt):
        # dataset rides as an ARGUMENT: a closure would embed it as an HLO
        # literal and blow the remote-compile request size (HTTP 413)
        def vae_step(carry, idx):
            vp, st, key = carry
            key, k1 = jax.random.split(key)
            loss, g = jax.value_and_grad(vae_loss)(vp, gt[idx], k1)
            up, st = vtx.update(g, st)
            return (optax.apply_updates(vp, up), st, key), loss

        (vp, st, key), losses = jax.lax.scan(vae_step, (vp, st, key), idxs)
        return vp, st, key, jnp.mean(losses)

    vae_chunk = jax.jit(vae_chunk_impl)

    order = np.random.default_rng(1)
    vp, key = params["vae"], jax.random.PRNGKey(2)
    t0 = time.perf_counter()
    done = 0
    while done < args.vae_steps:
        k = min(args.chunk, args.vae_steps - done)
        idx = order.integers(0, args.n_data, (k, args.batch)).astype(np.int32)
        vp, vstate, key, l = vae_chunk(vp, vstate, key, jnp.asarray(idx), gt)
        done += k
        print(f"[vae] {done}/{args.vae_steps} L1+KL {float(l):.4f} "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)
    params = dict(params, vae=vp)

    # ---------------- phase 2: LDM eps-model ----------------
    tcfg = TrainConfig(
        reconstruct=False, id_loss_weight=0.0, lpips_loss_weight=0.0,
        learning_rate=2e-4, warmup_steps=200, weight_decay=1e-4,
    )
    opt = make_optimizer(tcfg, params)  # VAE/towers frozen by trainable_mask
    ost = jax.jit(opt.init)(params)
    train_step = make_train_step(model, opt, tcfg)

    def ldm_chunk_impl(p, st, key, idxs, ds):
        def ldm_step(carry, idx):
            p, st, key = carry
            key, k1 = jax.random.split(key)
            batch = {
                "gt_image": ds["gt"][idx],
                "inpaint": ds["gt"][idx] * ds["keep"][idx],
                "mask": ds["keep"][idx],
                "ref_clip": ds["ref_clip"][idx],
                "ref_face01": ds["ref_face"][idx],
                "landmarks": ds["lmv"][idx],
            }
            p, st, logs = train_step(p, st, batch, k1)
            return (p, st, key), logs["loss"]

        (p, st, key), losses = jax.lax.scan(ldm_step, (p, st, key), idxs)
        return p, st, key, jnp.mean(losses)

    ldm_chunk = jax.jit(ldm_chunk_impl)
    ds = dict(gt=gt, keep=keep, ref_clip=ref_clip, ref_face=ref_face, lmv=lmv)

    key = jax.random.PRNGKey(3)
    t0 = time.perf_counter()
    done = 0
    while done < args.ldm_steps:
        k = min(args.chunk, args.ldm_steps - done)
        idx = order.integers(0, args.n_data, (k, args.batch)).astype(np.int32)
        params, ost, key, l = ldm_chunk(params, ost, key, jnp.asarray(idx), ds)
        done += k
        print(f"[ldm] {done}/{args.ldm_steps} loss {float(l):.4f} "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)

    # ---------------- phase 3 (optional): full recon+ID loss ----------------
    if args.recon_steps:
        tcfg3 = TrainConfig(
            reconstruct=True, reconstruct_steps=2,
            id_loss_weight=0.25, lpips_loss_weight=0.0,
            learning_rate=5e-5, warmup_steps=100, weight_decay=1e-4,
        )
        opt3 = make_optimizer(tcfg3, params)
        ost3 = jax.jit(opt3.init)(params)
        train_step3 = make_train_step(model, opt3, tcfg3)

        def recon_chunk_impl(p, st, key, idxs, ds):
            def step(carry, idx):
                p, st, key = carry
                key, k1 = jax.random.split(key)
                batch = {
                    "gt_image": ds["gt"][idx],
                    "inpaint": ds["gt"][idx] * ds["keep"][idx],
                    "mask": ds["keep"][idx],
                    "ref_clip": ds["ref_clip"][idx],
                    "ref_face01": ds["ref_face"][idx],
                    "landmarks": ds["lmv"][idx],
                }
                p, st, logs = train_step3(p, st, batch, k1)
                return (p, st, key), (logs["loss"], logs.get("loss_id", 0.0))

            (p, st, key), (losses, idls) = jax.lax.scan(step, (p, st, key), idxs)
            return p, st, key, jnp.mean(losses), jnp.mean(idls)

        recon_chunk = jax.jit(recon_chunk_impl)
        key = jax.random.PRNGKey(4)
        t0 = time.perf_counter()
        done = 0
        b3 = max(4, args.batch // 4)  # recon chain is ~4x the eps step
        while done < args.recon_steps:
            k = min(args.chunk, args.recon_steps - done)
            idx = order.integers(0, args.n_data, (k, b3)).astype(np.int32)
            params, ost3, key, l, lid = recon_chunk(
                params, ost3, key, jnp.asarray(idx), ds
            )
            done += k
            print(f"[recon] {done}/{args.recon_steps} loss {float(l):.4f} "
                  f"id {float(lid):.4f} ({time.perf_counter()-t0:.0f}s)",
                  flush=True)

    save_params_npz(args.out, jax.device_get(params))
    print(f"saved synthetic bundle to {args.out}", flush=True)


if __name__ == "__main__":
    main()
