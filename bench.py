"""Benchmark: swapped frames/sec/chip at 512px, 50-step DDIM (BASELINE.md north star).

Measures the COMPLETE per-window device pipeline as one jitted program —
VAE encodes, 50-step DDIM inversion, 50-step 3-chunk hooked sampling
(CFG + TSG recon branch + FSAI at input-block attn1), VAE decode — at the
reference video operating point (512², 6-frame window, CFG 3.0:
`VFace_video_swap_batch.sh` / `scripts/VFace_inference_batch.py:247,502,783`).

Implementation notes (tunneled-TPU backend):
* one jitted init + one jitted window program (every distinct program pays a
  remote compile of ~1-3 min);
* ``block_until_ready`` is a no-op on this backend — completion is forced by
  fetching a scalar with ``device_get``;
* the window skips the reference's dead co-inverted source chunk
  (output-identical; see vface_tpu/pipelines/video_swap.py) and keeps the
  inversion latent stack in HBM instead of disk.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline: the torch reference path at the same operating point measures
≈0.30 swapped frames/s on an A100 (50-step inversion + 50-step 3-chunk
sampling dominate; host preprocessing excluded for both sides).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: repeated driver runs skip the ~1-3 min
# remote compiles (cache lives in the repo workdir).
import os as _os

jax.config.update("jax_compilation_cache_dir", _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

A100_BASELINE_FPS = 0.30


def main():
    from vface_tpu.models import ModelConfig, VFaceModel
    from vface_tpu.pipelines.video_swap import SwapOptions, VideoSwapPipeline

    model = VFaceModel(ModelConfig.sd_v1_inpaint())
    params = jax.jit(model.init)(jax.random.PRNGKey(0))

    opts = SwapOptions()  # 50-step DDIM + 50-step inversion, 512², window 6, CFG 3.0
    pipe = VideoSwapPipeline(model, opts)
    f, s = opts.window, opts.image_size
    d = model.cfg.unet.context_dim

    crops = jax.random.normal(jax.random.PRNGKey(1), (f, s, s, 3)) * 0.2
    keep = jnp.ones((f, s, s, 1))
    cond = jax.random.normal(jax.random.PRNGKey(2), (f, 1, d))
    uncond = jax.random.normal(jax.random.PRNGKey(3), (f, 1, d))
    inv_c = jax.random.normal(jax.random.PRNGKey(4), (f, 1, d))
    c_src = jax.random.normal(jax.random.PRNGKey(5), (f, 1, d))
    src = jax.random.normal(jax.random.PRNGKey(6), (1, s, s, 3)) * 0.2
    src_keep = jnp.ones((1, s, s, 1))
    flow = jax.random.normal(jax.random.PRNGKey(7), (f - 1, s, s, 2))

    def run():
        out = pipe.swap_window(
            params, crops, keep, cond, uncond, inv_c, c_src, src, src_keep, flow
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
