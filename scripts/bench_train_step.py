#!/usr/bin/env python
"""Measure real training-step time on the chip (VERDICT weak #7).

Round 1 established that the FULL reference loss stack (4-step DDIM recon +
ID + LPIPS) at 512²/bs1 exceeds the 16 GB v5e HBM single-chip (ZeRO-1 over a
slice is the design answer; see PLAN.md). This script measures what DOES fit:

  A. 512², bs 1, eps+VLB loss only (reconstruct=False) — the core DDPM step.
  B. 512², bs 1, recon loss with reconstruct_steps=2, ID loss, no LPIPS —
     attempted; reported as OOM if the program still exceeds HBM.
  C. 256², bs 2, full reference stack (reconstruct_steps=4 + ID) — the
     reduced-resolution scaling point.

Run: VFACE_PLATFORM= python scripts/bench_train_step.py
"""

from __future__ import annotations

import dataclasses
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


def make_batch(b, s, clip_sz, rng):
    k = jax.random.split(rng, 6)
    return {
        "gt_image": jax.random.uniform(k[0], (b, s, s, 3)) * 2 - 1,
        "inpaint": jax.random.uniform(k[1], (b, s, s, 3)) * 2 - 1,
        "mask": (jax.random.uniform(k[2], (b, s, s, 1)) > 0.3).astype(jnp.float32),
        "ref_clip": jax.random.normal(k[3], (b, clip_sz, clip_sz, 3)) * 0.3,
        "ref_face01": jax.random.uniform(k[4], (b, 112, 112, 3)),
        "landmarks": jax.random.uniform(k[5], (b, 136)),
    }


def run_case(name, model_cfg, bs, tcfg):
    from vface_tpu.models import VFaceModel
    from vface_tpu.pipelines.train import make_optimizer, make_train_step

    model = VFaceModel(model_cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    opt = make_optimizer(tcfg, params)
    opt_state = jax.jit(opt.init)(params)
    step = jax.jit(make_train_step(model, opt, tcfg), donate_argnums=(0, 1))
    batch = make_batch(bs, model_cfg.image_size, model_cfg.cond.clip.image_size,
                       jax.random.PRNGKey(1))
    try:
        t0 = time.perf_counter()
        params, opt_state, logs = step(params, opt_state, batch, jax.random.PRNGKey(2))
        loss = float(jax.device_get(logs["loss"]))
        compile_s = time.perf_counter() - t0
        reps = 3
        t0 = time.perf_counter()
        for i in range(reps):
            params, opt_state, logs = step(params, opt_state, batch, jax.random.PRNGKey(3 + i))
            loss = float(jax.device_get(logs["loss"]))
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt*1e3:.0f} ms/step (loss {loss:.3f}; compile {compile_s:.0f}s)",
              flush=True)
        return {"ms_per_step": round(dt * 1e3, 1)}
    except Exception as e:
        msg = str(e)
        oom = "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg or "memory" in msg.lower()
        print(f"{name}: {'OOM' if oom else 'FAIL'} ({msg[:200]})", flush=True)
        return {"error": "oom" if oom else msg[:120]}


def main():
    from vface_tpu.models import ModelConfig
    from vface_tpu.pipelines.train import TrainConfig

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    results = {}
    full = ModelConfig.sd_v1_inpaint()
    results["512px_bs1_eps_only"] = run_case(
        "A 512² bs1 eps-only", full, 1,
        TrainConfig(reconstruct=False, warmup_steps=10),
    )
    results["512px_bs1_recon2_id"] = run_case(
        "B 512² bs1 recon2+ID", full, 1,
        TrainConfig(reconstruct_steps=2, lpips_loss_weight=0.0, warmup_steps=10),
    )
    half = dataclasses.replace(full, image_size=256)
    results["256px_bs2_full"] = run_case(
        "C 256² bs2 full stack", half, 2,
        TrainConfig(reconstruct_steps=4, lpips_loss_weight=0.0, warmup_steps=10),
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
