#!/usr/bin/env python
"""Host-inclusive e2e throughput of `swap_video_frames` at the bench.py
operating point (batch_windows=2, invert_packs=2, 512², 50+50 steps).

VERDICT r2 item 1's second criterion: the e2e (host align/parse/conditioning
+ tunnel transfers + PNG-less fetch) number must be within 15% of bench.py's
device-pipeline number. This drives the REAL host orchestration
(`VideoSwapPipeline.swap_video_frames` → the super-pack loop) on 48 random
frames; the first pass compiles, the second reports steady state.

Run: VFACE_PLATFORM= python scripts/bench_e2e_swap.py [--frames 48]
"""

from __future__ import annotations

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48)
    args = ap.parse_args()

    from vface_tpu.models import ModelConfig, VFaceModel
    from vface_tpu.pipelines.video_swap import SwapOptions, VideoSwapPipeline

    model = VFaceModel(ModelConfig.sd_v1_inpaint())
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    opts = SwapOptions(batch_windows=2, invert_packs=2)
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
    print(f"platform: {jax.devices()[0].platform}  frames={args.frames}", flush=True)

    n = args.frames
    frames_np = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(8), (n, s, s, 3)), np.float32
    )
    source_np = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(9), (s, s, 3)), np.float32
    )

    g = 2 * opts.window * opts.batch_windows  # one super-pack group
    for pas in ("compile", "steady"):
        t0 = time.perf_counter()
        marks = []
        sink = lambda s0, arr: marks.append(time.perf_counter()) or []  # noqa: E731

        class _M:  # minimal manifest: lets the pipeline call the sink
            def is_done(self, s0):
                return False

            def mark_done(self, s0, cnt, paths):
                pass

        out = pipe.swap_video_frames(
            params, aux_params, frames_np, source_np,
            manifest=_M(), window_sink=sink,
        )
        dt = time.perf_counter() - t0
        assert out.shape[0] == n
        msg = f"[{pas}] {dt:.2f}s = {n/dt:.4f} frames/s"
        steady_rate = None
        if len(marks) >= 2:
            # marginal (steady-state) rate: groups after the first, i.e.
            # the long-video limit with the pipeline prologue amortised out
            steady_rate = (len(marks) - 1) * g / (marks[-1] - marks[0])
            msg += f"  (steady-state cadence {steady_rate:.4f} f/s)"
        print(msg, flush=True)
    rec = {"metric": "e2e_swap_frames_per_sec", "value": round(n / dt, 4)}
    if steady_rate is not None:
        rec["steady_state_frames_per_sec"] = round(steady_rate, 4)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
