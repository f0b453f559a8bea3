#!/usr/bin/env python
"""Train-step reality check: the FULL recon+ID loss at realistic shapes on an
8-device mesh with ZeRO-1 — the sharded memory plan beyond toy shapes.

Single-chip 512²/bs1 recon training OOMs (HLO temp alloc, PLAN.md round-2
train table); the designed answer is data-parallel ZeRO-1 over the mesh.
This script proves that plan at 256²/bs8 (1 sample per device) with the
flagship 320-ch UNet and the runtime-exact loss (2-step DDIM recon chain +
per-intermediate masked ID loss), and records the step time.

On this host there are no 8 real chips, so the mesh is the 8-device virtual
CPU platform (the same environment the driver's dryrun_multichip uses) —
executing, not just compiling, the sharded program. CPU step time is NOT a
TPU projection; the pass/fail is the sharded memory plan executing the full
loss at shapes where a single chip OOMs.

Run: JAX_PLATFORMS=cpu python scripts/bench_mesh_train.py [--size 256] [--per_dev 1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--per_dev", type=int, default=1)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--recon_steps", type=int, default=2)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--no_remat", action="store_true",
                    help="disable UNet remat: ~halves the HLO op count the "
                    "XLA:CPU LLVM codegen must chew (the 125 GB host "
                    "compile-RAM wall) at the cost of larger runtime "
                    "activation buffers")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
        # 8 virtual devices time-slice ONE physical core here; XLA's default
        # 40 s collective rendezvous hard-kill fires spuriously under that
        # oversubscription at flagship shapes — raise all three timeouts
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
        + " --xla_cpu_collective_timeout_seconds=7200"
        # the flagship-scale train-step module OOM-killed the host at 123 GB
        # RSS during LLVM codegen (this is compile-time memory, not buffers);
        # skip the expensive LLVM passes — this is a memory-plan proof, not a
        # CPU-speed measurement
        + " --xla_llvm_disable_expensive_passes=true"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import dataclasses

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vface_tpu.models import ModelConfig, VFaceModel
    from vface_tpu.parallel.mesh import make_mesh, zero1_sharding
    from vface_tpu.pipelines.train import TrainConfig, make_optimizer, make_train_step

    n_dev = args.devices
    b = n_dev * args.per_dev
    cfg = ModelConfig.sd_v1_inpaint(dtype=jnp.bfloat16)
    cfg = dataclasses.replace(cfg, image_size=args.size)
    if args.no_remat:
        cfg = dataclasses.replace(
            cfg, unet=dataclasses.replace(cfg.unet, use_remat=False))
    model = VFaceModel(cfg)
    print(f"devices={n_dev} batch={b} size={args.size}² latent={cfg.latent_size}²",
          flush=True)

    t0 = time.perf_counter()
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"init: {n_params/1e6:.0f} M params in {time.perf_counter()-t0:.0f}s", flush=True)

    tcfg = TrainConfig(reconstruct_steps=args.recon_steps, warmup_steps=10)
    optimizer = make_optimizer(tcfg, params)
    opt_state = optimizer.init(params)
    train_step = make_train_step(model, optimizer, tcfg)

    mesh = make_mesh(n_data=n_dev, n_model=1)
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    oss = zero1_sharding(mesh, opt_state)
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, oss)

    s = args.size
    sz = cfg.cond.clip.image_size
    rng = np.random.default_rng(0)
    batch = jax.device_put(
        {
            "gt_image": jnp.asarray(rng.uniform(-1, 1, (b, s, s, 3)), jnp.float32),
            "inpaint": jnp.asarray(rng.uniform(-1, 1, (b, s, s, 3)), jnp.float32),
            "mask": jnp.ones((b, s, s, 1)),
            "ref_clip": jnp.asarray(rng.uniform(-1, 1, (b, sz, sz, 3)), jnp.float32),
            "ref_face01": jnp.asarray(rng.uniform(0, 1, (b, 112, 112, 3)), jnp.float32),
            "landmarks": jnp.asarray(rng.uniform(0, s, (b, 136)), jnp.float32),
        },
        shard,
    )

    step = jax.jit(
        train_step,
        in_shardings=(repl, oss, shard, repl),
        out_shardings=(repl, oss, repl),
        donate_argnums=(0, 1),
    )
    t0 = time.perf_counter()
    params, opt_state, logs = step(params, opt_state, batch, jax.random.PRNGKey(1))
    loss = float(logs["loss"])
    print(f"step 1 (compile+run): {time.perf_counter()-t0:.0f}s  loss={loss:.4f}",
          flush=True)
    assert np.isfinite(loss), "non-finite loss"
    for i in range(args.steps - 1):
        t0 = time.perf_counter()
        params, opt_state, logs = step(params, opt_state, batch, jax.random.PRNGKey(2 + i))
        loss = float(logs["loss"])
        print(f"step {i+2}: {time.perf_counter()-t0:.1f}s  loss={loss:.4f}", flush=True)
    bad = [
        jax.tree_util.keystr(k)
        for k, l in jax.tree_util.tree_leaves_with_path(params)
        if not bool(jnp.isfinite(l).all())
    ]
    assert not bad, f"non-finite params: {bad[:5]}"
    print("MESH TRAIN OK", flush=True)


if __name__ == "__main__":
    main()
