#!/usr/bin/env python
"""RAFT flow stage ablation on the real chip (the last unprofiled stage).

157 ms per 6-frame window (5 pairs, 20 GRU iterations) = 628 ms per
super-pack = ~2.2% of the program. Where does it go?

  full20      production: compute_flow on 6 frames (5 pairs), iters=20
  full4       iters=4 → per-iteration slope
  encoders    feature+context encoders only (iters=0 equivalent)

Run: VFACE_PLATFORM= python scripts/bench_raft_ablate.py
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

REPS = 10


def main():
    from vface_tpu.models.raft import RAFT, RAFTConfig

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    s = 512
    x1 = jax.random.uniform(jax.random.PRNGKey(0), (5, s, s, 3))
    x2 = jax.random.uniform(jax.random.PRNGKey(1), (5, s, s, 3))

    results = {}
    for name, iters in (("full20", 20), ("full4", 4), ("full1", 1)):
        raft = RAFT(RAFTConfig(iters=iters))
        params = jax.jit(raft.init)(jax.random.PRNGKey(2), x1[:1], x2[:1])

        f = jax.jit(lambda p, a, b: raft.apply(p, a, b))
        out = f(params, x1, x2)
        jax.device_get(jax.tree.leaves(out)[0].ravel()[:4])
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = f(params, x1, x2)
        jax.device_get(jax.tree.leaves(out)[0].ravel()[:4])
        per = (time.perf_counter() - t0) / REPS * 1e3
        results[name] = round(per, 1)
        print(f"{name:10s} {per:8.1f} ms / 5 pairs", flush=True)
    if "full20" in results and "full4" in results:
        slope = (results["full20"] - results["full4"]) / 16.0
        base = results["full4"] - 4 * slope
        print(f"per-iteration ≈ {slope:.2f} ms; encoders+corr+fixed ≈ {base:.1f} ms",
              flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
