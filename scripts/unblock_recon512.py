#!/usr/bin/env python
"""Unblock the 512² bs1 recon2+ID training step (VERDICT r4 next-item 5).

The FUSED fwd+bwd of the full loss at 512² bs1 reconstruct_steps=2 + ID dies
deterministically in the remote tpu_compile_helper (HTTP 500 subprocess
crash — a server-side compiler failure, not device OOM; PLAN.md r4 item 3).
This script measures the mitigation ladder:

  A. fused step (the known failure — retried once per the transient-500 rule)
  B. SPLIT step (`pipelines.train.make_split_train_step`): eps-part grads,
     recon-part grads, optimizer apply as three separate programs with
     identical rng draws — exact same semantics, far smaller per-program
     op count.
  C. (reported for scale) split step at 512² recon4+ID — the full reference
     chain length (`ddpm.py:1696-1729`, Reconstruct_DDIM_steps=4).

Run: VFACE_PLATFORM= python scripts/unblock_recon512.py
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


def run(name, step_fn, params, opt_state, batch, retries=1):
    for attempt in range(retries + 1):
        try:
            t0 = time.perf_counter()
            params2, opt_state2, logs = step_fn(
                params, opt_state, batch, jax.random.PRNGKey(2)
            )
            loss = float(jax.device_get(logs["loss"]))
            compile_s = time.perf_counter() - t0
            reps = 3
            t0 = time.perf_counter()
            for i in range(reps):
                params2, opt_state2, logs = step_fn(
                    params2, opt_state2, batch, jax.random.PRNGKey(3 + i)
                )
                loss = float(jax.device_get(logs["loss"]))
            dt = (time.perf_counter() - t0) / reps
            print(f"{name}: {dt*1e3:.0f} ms/step (loss {loss:.3f}; "
                  f"compile {compile_s:.0f}s)", flush=True)
            return {"ms_per_step": round(dt * 1e3, 1)}
        except Exception as e:  # noqa: BLE001
            msg = str(e).replace("\n", " ")[:200]
            print(f"{name}: attempt {attempt+1} FAIL ({msg})", flush=True)
    return {"error": msg}


def main():
    from vface_tpu.models import ModelConfig, VFaceModel
    from vface_tpu.pipelines.train import (
        TrainConfig,
        make_optimizer,
        make_split_train_step,
        make_train_step,
    )

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    model = VFaceModel(ModelConfig.sd_v1_inpaint())
    results = {}

    for name, recon_steps, fused in (
        ("A_fused_512_recon2_id", 2, True),
        ("B_split_512_recon2_id", 2, False),
        ("C_split_512_recon4_id", 4, False),
    ):
        tcfg = TrainConfig(
            reconstruct=True, reconstruct_steps=recon_steps,
            id_loss_weight=0.3, lpips_loss_weight=0.0,
        )
        params = jax.jit(model.init)(jax.random.PRNGKey(0))
        opt = make_optimizer(tcfg, params)
        opt_state = jax.jit(opt.init)(params)
        if fused:
            step = jax.jit(make_train_step(model, opt, tcfg), donate_argnums=(0, 1))
        else:
            step = make_split_train_step(model, opt, tcfg)
        batch = make_batch(1, 512, model.cfg.cond.clip.image_size,
                           jax.random.PRNGKey(1))
        results[name] = run(name, step, params, opt_state, batch)
        del params, opt_state
    print(json.dumps(results))


if __name__ == "__main__":
    main()
