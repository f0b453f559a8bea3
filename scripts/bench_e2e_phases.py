#!/usr/bin/env python
"""Phase-resolved e2e timing of swap_video_frames internals on the real chip.

Mirrors the pipeline's host orchestration step by step, fencing after each
phase, to locate non-device overhead (tunnel transfers, host numpy, extra
program dispatches). Second pass reports steady-state (all programs cached).

Run: VFACE_PLATFORM= python scripts/bench_e2e_phases.py
"""

from __future__ import annotations

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


def main():
    from vface_tpu.models import ModelConfig, VFaceModel
    from vface_tpu.pipelines.video_swap import SwapOptions, VideoSwapPipeline
    from vface_tpu.preprocess.masks import TRAIN_REMOVE, inpaint_inputs
    from vface_tpu.preprocess.landmarks import landmarks_to_vector
    from vface_tpu.models.clip import clip_preprocess

    model = VFaceModel(ModelConfig.sd_v1_inpaint())
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    opts = SwapOptions()
    pipe = VideoSwapPipeline(model, opts)
    s = opts.image_size
    rng = jax.random.PRNGKey(1)
    aux_params = {
        "bisenet": jax.jit(pipe.bisenet.init)(rng, jnp.zeros((1, 64, 64, 3)))["params"],
        "raft": jax.jit(pipe.raft.init)(
            rng, jnp.zeros((1, s, s, 3)), jnp.zeros((1, s, s, 3))
        )["params"],
        "landmark": jax.jit(pipe.landmark_net.init)(rng, jnp.zeros((1, s, s, 3)))["params"],
    }
    print(f"platform: {jax.devices()[0].platform}", flush=True)

    n = 18
    frames_np = np.asarray(jax.random.uniform(jax.random.PRNGKey(8), (n, s, s, 3)), np.float32)
    source_np = np.asarray(jax.random.uniform(jax.random.PRNGKey(9), (s, s, 3)), np.float32)

    for pas in ("compile", "steady"):
        t_all = time.perf_counter()
        ph = {}

        def tick(name, t0):
            ph[name] = ph.get(name, 0.0) + (time.perf_counter() - t0)

        t0 = time.perf_counter()
        frames01 = jnp.asarray(frames_np)
        _ = jax.device_get(jnp.sum(frames01[0]))
        tick("upload", t0)

        t0 = time.perf_counter()
        crops01, inv_coeffs = pipe.align_crops(aux_params, frames01)
        _ = jax.device_get(jnp.sum(crops01[0, 0]))
        tick("align", t0)

        t0 = time.perf_counter()
        seg = pipe.parse_masks(aux_params, crops01)
        _, keep_mask = inpaint_inputs(crops01 * 2 - 1, seg, TRAIN_REMOVE)
        _ = jax.device_get(jnp.sum(keep_mask[0, 0]))
        tick("parse", t0)

        t0 = time.perf_counter()
        src = jnp.asarray(source_np)[None]
        src_crop01, _ = pipe.align_crops(aux_params, src)
        src_seg = pipe.parse_masks(aux_params, src_crop01)
        _, src_keep = inpaint_inputs(src_crop01 * 2 - 1, src_seg, TRAIN_REMOVE)
        src_clip = clip_preprocess(src_crop01 * (1.0 - src_keep), model.cfg.cond.clip.image_size)
        src_lm = landmarks_to_vector(pipe.detect_landmarks(aux_params, src_crop01))
        _ = jax.device_get(jnp.sum(src_clip))
        tick("src_prep", t0)

        w = opts.window
        outs = []
        for s0 in range(0, n, w):
            sl = slice(s0, s0 + w)
            t0 = time.perf_counter()
            flow = pipe.compute_flow(aux_params, crops01[sl])
            _ = jax.device_get(jnp.sum(flow[0, 0]))
            tick("flow", t0)

            t0 = time.perf_counter()
            c = crops01[sl] * 2 - 1
            km = keep_mask[sl]
            cond, uncond, inv_c, c_src = pipe.window_conditionings(
                params, aux_params, c, km, src_clip, src_crop01, src_lm
            )
            _ = jax.device_get(jnp.sum(cond[0]))
            tick("conditioning", t0)

            t0 = time.perf_counter()
            pasted = pipe.swap_window_pasted(
                params, frames01[sl], inv_coeffs[sl], c, km,
                cond, uncond, inv_c, c_src, src_crop01 * 2 - 1, src_keep, flow,
            )
            _ = jax.device_get(jnp.sum(pasted[0, 0]))
            tick("window", t0)

            t0 = time.perf_counter()
            outs.append(np.asarray(pasted))
            tick("fetch", t0)

        total = time.perf_counter() - t_all
        print(f"[{pas}] total {total:.2f}s = {n/total:.3f} frames/s", flush=True)
        for k, v in ph.items():
            print(f"   {k:12s} {v:7.2f}s", flush=True)


if __name__ == "__main__":
    main()
