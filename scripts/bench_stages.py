#!/usr/bin/env python
"""Per-stage timing of the video-swap pipeline on the real chip, plus one
full e2e run (host align/parse/flow/paste INCLUDED) — the stage-time table
VERDICT asked for (round-1 bench measured the device window only).

Programs timed (each jitted once, timed over reps with device_get fencing):
  vae_encode      6×512² frames → latents
  inversion       50-step 1-chunk DDIM inversion (recon-free operating point)
  sampling        50-step 2-chunk hooked CFG sampling
  vae_decode      latents → 6 frames (+ background re-encode trick)
  raft_flow       5 consecutive-pair flows at 512²
  bisenet         6-frame parsing at 512²
  landmarks       6-frame LandmarkNet
  e2e             swap_video_frames on an 18-frame synthetic video
                  (align → parse → 3 windows → paste-back, async dispatch)

Run: VFACE_PLATFORM= python scripts/bench_stages.py [--pack=2] [--only=a,b]

--pack=W wraps inversion/sampling/decode in vmap over W windows — the
batch_windows operating point bench.py runs at (W=2 ⇒ UNet b=24). Comparing
``sampling/steps`` against bench_unet_ablate's raw 2-chunk eval isolates the
per-step hook (FSAI/FGATS) + CFG + DDIM-update overhead at that point.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def fence(x):
    return float(jax.device_get(jnp.sum(jnp.asarray(x).astype(jnp.float32).ravel()[:1])))


def timeit(fn, reps=3, label=""):
    t0 = time.perf_counter()
    fence(fn())
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        fence(fn())
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:12s}  {dt*1e3:9.1f} ms   (compile+warm {compile_s:.1f}s)", flush=True)
    return dt


def main():
    from vface_tpu.models import ModelConfig, VFaceModel
    from vface_tpu.pipelines.video_swap import SwapOptions, VideoSwapPipeline
    from vface_tpu.samplers.inversion import ddim_invert
    from vface_tpu.samplers.vface import vface_sample

    pack = 1
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--pack="):
            pack = int(a.split("=", 1)[1])
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")

    model = VFaceModel(ModelConfig.sd_v1_inpaint())
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    opts = SwapOptions()
    pipe = VideoSwapPipeline(model, opts)
    f, s = opts.window, opts.image_size
    d = model.cfg.unet.context_dim
    hl = model.cfg.latent_size
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    rng = jax.random.PRNGKey(1)
    aux_params = {
        "bisenet": jax.jit(pipe.bisenet.init)(rng, jnp.zeros((1, 64, 64, 3)))["params"],
        "raft": jax.jit(pipe.raft.init)(
            rng, jnp.zeros((1, s, s, 3)), jnp.zeros((1, s, s, 3))
        )["params"],
        "landmark": jax.jit(pipe.landmark_net.init)(rng, jnp.zeros((1, s, s, 3)))["params"],
    }

    crops = jax.random.uniform(jax.random.PRNGKey(2), (f, s, s, 3))
    keep = jnp.ones((f, s, s, 1))
    cond = jax.random.normal(jax.random.PRNGKey(3), (f, 1, d))
    uncond = jax.random.normal(jax.random.PRNGKey(4), (f, 1, d))
    inv_c = jax.random.normal(jax.random.PRNGKey(5), (f, 1, d))
    z = jax.random.normal(jax.random.PRNGKey(6), (f, hl, hl, 4))
    mask_lat = jnp.ones((f, hl, hl, 1))
    flow_q = jax.random.normal(jax.random.PRNGKey(7), (f - 1, hl, hl, 2))

    times = {}

    def maybe(name, thunk):
        if only is None or name in only:
            times[name] = timeit(thunk, label=name)

    def tile(x):
        return jnp.stack([x] * pack) if pack > 1 else x

    enc = jax.jit(lambda p, x: model.encode_first_stage(p, x))
    maybe("vae_encode", lambda: enc(params, crops * 2 - 1))

    def inv1(p, z_, c_):
        return ddim_invert(
            model, p, z_, c_, z_, mask_lat,
            num_steps=opts.inversion_steps, keep=f, skip_last=1,
        )[1]

    if pack == 1:
        inv = jax.jit(inv1)
    else:
        inv = jax.jit(
            lambda p, zs, cs: jax.vmap(lambda a, b: inv1(p, a, b))(zs, cs)
        )
    z_p, inv_c_p = tile(z), tile(inv_c)
    maybe("inversion", lambda: inv(params, z_p, inv_c_p))
    inv_lat = None
    if only is None or "sampling" in only:
        inv_lat = inv(params, z_p, inv_c_p)

    def samp1(p, sc, il, co, un, ic, z_, fl):
        return vface_sample(
            model, p, sc, co, un, ic, il, z_, mask_lat,
            pipe.injection, flow=fl, num_steps=opts.ddim_steps,
            cfg_scale=opts.cfg_scale, drop_recon_chunk=True,
        )[0]

    if pack == 1:
        samp = jax.jit(
            lambda p, sc, il: samp1(p, sc, il, cond, uncond, inv_c, z, flow_q)
        )
        maybe("sampling", lambda: samp(params, inv_lat[-1], inv_lat))
    else:
        cond_p, unc_p, z_lat_p, flow_p = tile(cond), tile(uncond), tile(z), tile(flow_q)
        samp = jax.jit(
            lambda p, scs, ils: jax.vmap(
                lambda sc, il, co, un, ic, z_, fl: samp1(p, sc, il, co, un, ic, z_, fl)
            )(scs, ils, cond_p, unc_p, inv_c_p, z_lat_p, flow_p)
        )
        maybe("sampling", lambda: samp(params, inv_lat[:, -1], inv_lat))

    # raw 2-chunk UNet eval (no injection) — sampling/50 minus this ≈ the
    # FSAI/FGATS fusion + DDIM-update overhead per step
    x9 = jnp.concatenate([jnp.tile(z, (2, 1, 1, 1)),
                          jnp.tile(z, (2, 1, 1, 1)),
                          jnp.tile(mask_lat, (2, 1, 1, 1))], axis=-1)
    t_vec = jnp.full((2 * f,), 500, jnp.int32)
    c2 = jnp.concatenate([uncond, cond], axis=0)
    raw = jax.jit(lambda p, x_, c_: model.apply_model(p, x_, t_vec, c_))
    maybe("unet_raw_2ch", lambda: raw(params, x9, c2))

    if pack == 1:
        dec = jax.jit(lambda p, z_: model.decode_first_stage(p, z_))
        maybe("vae_decode", lambda: dec(params, z))
    else:
        dec = jax.jit(
            lambda p, zs: jax.vmap(lambda z_: model.decode_first_stage(p, z_))(zs)
        )
        maybe("vae_decode", lambda: dec(params, z_p))

    bgd = jax.jit(lambda p, x: pipe.decode_with_background(p, x))
    maybe("background", lambda: bgd(params, crops * 2 - 1))

    raft = jax.jit(lambda a, x: pipe.compute_flow(a, x))
    maybe("raft_flow", lambda: raft(aux_params, crops))

    seg = jax.jit(lambda a, x: pipe.parse_masks(a, x))
    maybe("bisenet", lambda: seg(aux_params, crops))

    lm = jax.jit(lambda a, x: pipe.detect_landmarks(a, x))
    maybe("landmarks", lambda: lm(aux_params, crops))

    # ---- e2e: 3 windows incl. host orchestration + aux + paste-back
    if only is None or "e2e" in only:
        frames = np.asarray(
            jax.random.uniform(jax.random.PRNGKey(8), (3 * f, s, s, 3)), np.float32
        )
        source = np.asarray(jax.random.uniform(jax.random.PRNGKey(9), (s, s, 3)), np.float32)
        t0 = time.perf_counter()
        out = pipe.swap_video_frames(params, aux_params, frames, source)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = pipe.swap_video_frames(params, aux_params, frames, source)
        e2e = time.perf_counter() - t0
        print(f"e2e: {e2e:.2f}s for {out.shape[0]} frames = {out.shape[0]/e2e:.3f} frames/s "
              f"(compile pass {compile_s:.1f}s)", flush=True)
        times["e2e_frames_per_s"] = out.shape[0] / e2e

    if only is None:
        window_device = (
            times["vae_encode"] + times["inversion"] + times["sampling"]
            + times["vae_decode"] + times["background"]
        )
        aux = times["raft_flow"] + times["bisenet"] + times["landmarks"]
        print(f"\ndevice window total {window_device:.2f}s; aux nets {aux*1e3:.0f} ms/window")
    print(json.dumps({k: round(v, 4) for k, v in times.items()}))


if __name__ == "__main__":
    main()
