#!/usr/bin/env python
"""IMAGE operating point throughput: 50-step CFG DDIM face swap at 512².

The video bench (bench.py) covers the reference's video operating point;
this measures the image test-bench path (`pipelines/image_swap.
swap_image_batch` — `inference_test_bench.sh`: 50-step DDIM, CFG 3.0/3.5,
512², no inversion) at several batch sizes. Reference-side comparison: a
50-step CFG SD image on A100 diffusers is ≈2.4 s (≈0.42 image/s at b=1).

Run: VFACE_PLATFORM= python scripts/bench_image_swap.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

REPS = 3


def main():
    from vface_tpu.models import ModelConfig, VFaceModel
    from vface_tpu.pipelines.image_swap import ImageSwapOptions, swap_image_batch

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    model = VFaceModel(ModelConfig.sd_v1_inpaint())
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    s = 512
    sz = model.cfg.cond.clip.image_size
    opts = ImageSwapOptions()

    results = {}
    for b in (8, 16, 24):
        tar = jax.random.uniform(jax.random.PRNGKey(1), (b, s, s, 3)) * 2 - 1
        keep = jnp.ones((b, s, s, 1))
        src_clip = jax.random.normal(jax.random.PRNGKey(2), (b, sz, sz, 3)) * 0.3
        src_face = jax.random.uniform(jax.random.PRNGKey(3), (b, 112, 112, 3))
        lm = jax.random.uniform(jax.random.PRNGKey(4), (b, 136)) * s

        f = jax.jit(
            lambda p, t, k, sc, sf, l: swap_image_batch(
                model, p, t, k, sc, sf, l, opts
            )
        )
        out = f(params, tar, keep, src_clip, src_face, lm)
        jax.device_get(out.ravel()[:4])
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = f(params, tar, keep, src_clip, src_face, lm)
        jax.device_get(out.ravel()[:4])
        dt = (time.perf_counter() - t0) / REPS
        ips = b / dt
        results[f"b{b}"] = round(ips, 3)
        print(f"b={b:<3d} {dt:6.2f} s/batch = {ips:6.3f} images/s "
              f"({ips/0.42:.2f}x the A100 b=1 image baseline)", flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
