"""Benchmark: swapped frames/sec/chip at 512px, 50-step DDIM (BASELINE.md north star).

Measures the COMPLETE per-window device pipeline — RAFT flow, VAE encodes,
50-step DDIM inversion, 50-step hooked CFG sampling (FSAI/FGATS at
input-block attn1), VAE decode, background re-encode trick, perspective
paste-back — at the reference video operating point (512², 6-frame windows,
CFG 3.0: `VFace_video_swap_batch.sh` / `scripts/VFace_inference_batch.py:
247,502,783`). Host-side align/parse/conditioning are excluded (measured
separately in `scripts/bench_e2e_phases.py`: <0.2 s/window once jitted), as
is tunnel transfer time, matching the A100 baseline's accounting.

Operating point notes (all output-exact vs the reference semantics,
pinned by tests/test_pipeline_e2e.py):
* dead-compute removals: co-inverted source chunk, inert TSG recon chunk,
  the discarded final inversion step, and the eta=0 noise term skipped
  (bit-identical; see vface_tpu/pipelines/video_swap.py);
* `batch_windows=2`: two consecutive windows ride one program with the FGATS
  blend masked at the boundary — bit-equal to separate windows, better MXU
  utilisation;
* `invert_packs=2` (the super-pack program): two packs' inversions run as
  ONE b=24 scan — the measured v5e per-row batch sweet spot
  (scripts/bench_batch_scaling.py: b=12 8.00 vs b=24 7.08 ms/row) — then
  each pack samples at its usual b=24, with VAE/background/paste at b=24;
* flow is the gather-free dense-lookup RAFT (157 ms/window, bit-matching).

Tunneled-TPU backend notes: one jitted program per stage (every distinct
program pays a remote compile, cached persistently); ``block_until_ready`` is
a no-op on this backend — completion is forced by fetching a scalar.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline: the torch reference path at the same operating point measures
≈0.30 swapped frames/s on an A100 (50-step inversion + 50-step 3-chunk
sampling dominate; derivation in BASELINE.md).
"""

from __future__ import annotations

import json
import os as _os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

A100_BASELINE_FPS = 0.30


def main():
    from vface_tpu.models import ModelConfig, VFaceModel
    from vface_tpu.pipelines.video_swap import SwapOptions, VideoSwapPipeline

    model = VFaceModel(ModelConfig.sd_v1_inpaint())
    params = jax.jit(model.init)(jax.random.PRNGKey(0))

    # 50-step DDIM + 50-step inversion, 512², CFG 3.0; the super-pack program:
    # 2 packs × (2 windows × 6 frames), inversion batched at b=24
    opts = SwapOptions(batch_windows=2, invert_packs=2)
    pipe = VideoSwapPipeline(model, opts)
    w = opts.window * opts.batch_windows  # frames per pack
    f = 2 * w                             # frames per super-pack program
    s = opts.image_size
    d = model.cfg.unet.context_dim

    rng = jax.random.PRNGKey(1)
    aux = {
        "raft": jax.jit(pipe.raft.init)(
            rng, jnp.zeros((1, s, s, 3)), jnp.zeros((1, s, s, 3))
        )["params"],
    }

    frames01 = jax.random.uniform(jax.random.PRNGKey(8), (f, s, s, 3))
    crops01 = jax.random.uniform(jax.random.PRNGKey(1), (f, s, s, 3))
    keep = jnp.ones((f, s, s, 1))
    cond = jax.random.normal(jax.random.PRNGKey(2), (f, 1, d))
    uncond = jax.random.normal(jax.random.PRNGKey(3), (f, 1, d))
    inv_c = jax.random.normal(jax.random.PRNGKey(4), (f, 1, d))
    # identity frame→crop perspective (a,b,c,d,e,f,g,h)
    ident = np.tile(np.asarray([1, 0, 0, 0, 1, 0, 0, 0], np.float32), (f, 1))
    inv_coeffs = jnp.asarray(ident)
    # within-pack FGATS boundary mask (between the two windows of each pack)
    m = np.ones((w - 1,), np.float32)
    for b0 in range(opts.window, w, opts.window):
        m[b0 - 1] = 0.0
    pm = jnp.asarray(m)

    def run():
        flow = pipe.compute_flow_superpack(aux, crops01)
        out = pipe._superpack_jit(
            params, frames01, inv_coeffs, crops01 * 2 - 1, keep,
            cond, uncond, inv_c, flow, pm, pm, has_flow=True,
        )
        return float(jax.device_get(jnp.mean(out)))

    run()  # compile + warmup (forces param init too)
    n_rep = 2
    t0 = time.perf_counter()
    for _ in range(n_rep):
        run()
    dt = (time.perf_counter() - t0) / n_rep

    fps = f / dt
    print(
        json.dumps(
            {
                "metric": "swap_frames_per_sec_per_chip_512px_50step_e2e",
                "value": round(fps, 4),
                "unit": "frames/s",
                "vs_baseline": round(fps / A100_BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
