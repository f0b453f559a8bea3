"""Benchmark: swapped frames/sec/chip at 512px, 50-step DDIM (BASELINE.md north star).

Measures the COMPLETE per-window device pipeline — RAFT flow, VAE encodes,
50-step DDIM inversion, 50-step hooked CFG sampling (FSAI/FGATS at
input-block attn1), VAE decode, background re-encode trick, perspective
paste-back — at the reference video operating point (512², 6-frame windows,
CFG 3.0: `VFace_video_swap_batch.sh` / `scripts/VFace_inference_batch.py:
247,502,783`). Host-side align/parse/conditioning are excluded (measured
separately in `scripts/bench_e2e_phases.py`: <0.2 s/window once jitted), as
is tunnel transfer time, matching the A100 baseline's accounting.

Operating point notes (all output-exact vs the reference semantics):
* dead-compute removals: co-inverted source chunk and inert TSG recon chunk
  skipped (bit-identical; see vface_tpu/pipelines/video_swap.py);
* `batch_windows=2`: two consecutive windows ride one program with the FGATS
  blend masked at the boundary — bit-equal to separate windows, better MXU
  utilisation (sweep: bw=1/2/4 → 0.685/0.785/0.795 window-only f/s);
* flow is the gather-free dense-lookup RAFT (157 ms/window, bit-matching).

Tunneled-TPU backend notes: one jitted program per stage (every distinct
program pays a remote compile, cached persistently); ``block_until_ready`` is
a no-op on this backend — completion is forced by fetching a scalar.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline: the torch reference path at the same operating point measures
≈0.30 swapped frames/s on an A100 (50-step inversion + 50-step 3-chunk
sampling dominate).
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

    # 50-step DDIM + 50-step inversion, 512², CFG 3.0; two 6-frame windows
    # packed per program (bit-equal to separate windows via pair_mask)
    opts = SwapOptions(batch_windows=2)
    pipe = VideoSwapPipeline(model, opts)
    f = opts.window * opts.batch_windows
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
    c_src = jax.random.normal(jax.random.PRNGKey(5), (f, 1, d))
    src = jax.random.normal(jax.random.PRNGKey(6), (1, s, s, 3)) * 0.2
    src_keep = jnp.ones((1, s, s, 1))
    # identity frame→crop perspective (a,b,c,d,e,f,g,h)
    ident = np.tile(np.asarray([1, 0, 0, 0, 1, 0, 0, 0], np.float32), (f, 1))
    inv_coeffs = jnp.asarray(ident)
    m = np.ones((f - 1,), np.float32)
    for b0 in range(opts.window, f, opts.window):
        m[b0 - 1] = 0.0
    pair_mask = jnp.asarray(m)

    def run():
        flow = pipe.compute_flow(aux, crops01)
        out = pipe.swap_window_pasted(
            params, frames01, inv_coeffs, crops01 * 2 - 1, keep,
            cond, uncond, inv_c, c_src, src, src_keep, flow,
            pair_mask=pair_mask,
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
