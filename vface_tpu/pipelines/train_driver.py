"""Training driver — the `main.py` equivalent (CLI, loop, callbacks).

Capability parity with `/root/reference/REFace/main.py:447-758` redesigned
for JAX:

* config assembly: typed `TrainConfig`/`ModelConfig` + optional YAML with
  `target:` nodes (``vface_tpu.utils.config``) and dotlist overrides;
* Lightning Trainer → a plain step loop around the pjit'd
  `make_train_step` with donated state (DDP/NCCL → mesh `data` axis);
* callbacks:
  - checkpointing: save_last + top-k on the monitored loss
    (`TrainCheckpointer`, main.py:598-611) and save-on-exception (melk,
    main.py:731-756 — here a try/finally);
  - image logging every N steps (`ImageLogger`, main.py:317-366): decoded
    reconstruction grids written as PNGs;
  - learning-rate scaling: lr = accum × n_data × bs × base when enabled
    (main.py:719-727);
  - per-epoch wall time (CUDACallback analogue) through `StageTimer`.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vface_tpu.models.ldm import ModelConfig, VFaceModel
from vface_tpu.parallel.mesh import make_mesh
from vface_tpu.pipelines.train import TrainConfig, make_optimizer, make_train_step
from vface_tpu.runtime.checkpoint import TrainCheckpointer
from vface_tpu.utils.profiling import StageTimer


@dataclasses.dataclass
class DriverConfig:
    logdir: str = "logs/vface"
    max_steps: int = 100_000
    log_every: int = 50
    image_log_every: int = 500  # ImageLogger batch_frequency (main.py:637)
    ckpt_every: int = 2_000
    scale_lr: bool = False
    batch_size: int = 1  # per the reference operating point (train.yaml:101)
    seed: int = 42


def _save_image_grid(path: str, images01: np.ndarray) -> None:
    from PIL import Image

    n, h, w, _ = images01.shape
    grid = (np.clip(images01, 0, 1) * 255).astype(np.uint8).reshape(n * h, w, 3)
    Image.fromarray(grid).save(path)


def train(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    driver_cfg: DriverConfig,
    batches: Iterator[dict],
    init_params=None,
    perceptual_fn: Optional[Callable] = None,
    n_data: Optional[int] = None,
):
    """Run the training loop. ``batches`` yields numpy dicts (see
    `vface_tpu.pipelines.train.p_losses_face` for keys). Returns final params."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(n_data=n_data)
    model = VFaceModel(model_cfg)
    rng = jax.random.PRNGKey(driver_cfg.seed)

    if driver_cfg.scale_lr:
        n = mesh.shape["data"]
        lr = train_cfg.learning_rate * n * driver_cfg.batch_size
        train_cfg = dataclasses.replace(train_cfg, learning_rate=lr)
        print(f"[train] scaled lr to {lr:.2e} ({n} shards × bs {driver_cfg.batch_size})")

    params = init_params if init_params is not None else model.init(rng)
    optimizer = make_optimizer(train_cfg, params)  # reference trainable set
    opt_state = optimizer.init(params)
    step_fn = make_train_step(model, optimizer, train_cfg, perceptual_fn)

    from vface_tpu.parallel.mesh import zero1_sharding

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    oss = zero1_sharding(mesh, opt_state)  # ZeRO-1: Adam moments shard over data
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, oss)
    jit_step = jax.jit(
        step_fn,
        in_shardings=(repl, oss, shard, repl),
        out_shardings=(repl, oss, repl),
        donate_argnums=(0, 1),
    )

    os.makedirs(driver_cfg.logdir, exist_ok=True)
    img_dir = os.path.join(driver_cfg.logdir, "images")
    os.makedirs(img_dir, exist_ok=True)
    ckpt = TrainCheckpointer(os.path.join(driver_cfg.logdir, "checkpoints"))
    timer = StageTimer()
    from vface_tpu.utils.logging import MetricsLogger

    metrics = MetricsLogger(driver_cfg.logdir, echo=False)
    step = 0
    try:
        t_epoch = time.perf_counter()
        for batch in batches:
            if step >= driver_cfg.max_steps:
                break
            rng, sub = jax.random.split(rng)
            batch_dev = jax.device_put(
                {k: jnp.asarray(v) for k, v in batch.items()}, shard
            )
            with timer.stage("train_step"):
                params, opt_state, logs = jit_step(params, opt_state, batch_dev, sub)
            step += 1
            if step % driver_cfg.log_every == 0:
                vals = {k: float(v) for k, v in logs.items()}
                dt = time.perf_counter() - t_epoch
                vals["sec_per_it"] = dt / driver_cfg.log_every
                metrics.log(step, vals, prefix="train")
                print(f"[train] step {step} {vals}")
                t_epoch = time.perf_counter()
            if step % driver_cfg.image_log_every == 0:
                z = model.encode_first_stage(params, batch_dev["gt_image"][:4])
                rec = model.decode_first_stage(params, z)
                _save_image_grid(
                    os.path.join(img_dir, f"rec_{step:08d}.png"),
                    np.asarray((rec + 1) * 0.5),
                )
            if step % driver_cfg.ckpt_every == 0:
                ckpt.save_last({"params": params, "opt_state": opt_state}, step)
                ckpt.save_monitored(
                    {"params": params}, step, float(logs.get("loss_simple", 0.0))
                )
    finally:
        # melk(): persist last state on any exit path (main.py:731-756).
        # params/opt_state are DONATED into jit_step — if the step itself
        # raised (OOM/preemption, the exact case melk protects against) the
        # buffers bound to these names are already deleted; saving them would
        # raise and lose the exception-save entirely. Only save when the
        # state is alive; otherwise the last periodic checkpoint stands.
        def _alive(tree) -> bool:
            return all(
                not getattr(leaf, "is_deleted", lambda: False)()
                for leaf in jax.tree_util.tree_leaves(tree)
            )

        if _alive(params) and _alive(opt_state):
            ckpt.save_last({"params": params, "opt_state": opt_state}, step)
            print(f"[train] saved last.ckpt at step {step}")
        else:
            last_periodic = (step // driver_cfg.ckpt_every) * driver_cfg.ckpt_every
            print(
                "[train] state was donated to a failed step; last.ckpt from "
                f"step {last_periodic} stands (in-flight step {step} lost)"
            )
        print(timer.report())
    return params


def validate(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    params,
    val_batches: Iterator[dict],
    rng=None,
    ema_params=None,
    max_batches: int = 50,
):
    """Validation pass — Lightning's val loop with EMA/non-EMA loss dicts
    (ddpm.py:507-514): evaluates `p_losses_face` without gradients for the
    raw params and, when given, the EMA weights (`val/..._ema` keys)."""
    from vface_tpu.pipelines.train import p_losses_face

    model = VFaceModel(model_cfg)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    loss_fn = jax.jit(
        lambda p, batch, r: p_losses_face(model, p, batch, r, train_cfg)[1]
    )
    sums: dict = {}
    counts = 0
    for i, batch in enumerate(val_batches):
        if i >= max_batches:
            break
        rng, sub = jax.random.split(rng)
        batch_dev = {k: jnp.asarray(v) for k, v in batch.items()}
        logs = loss_fn(params, batch_dev, sub)
        for k, v in logs.items():
            sums[f"val/{k}"] = sums.get(f"val/{k}", 0.0) + float(v)
        if ema_params is not None:
            logs_ema = loss_fn(ema_params, batch_dev, sub)
            for k, v in logs_ema.items():
                sums[f"val/{k}_ema"] = sums.get(f"val/{k}_ema", 0.0) + float(v)
        counts += 1
    return {k: v / max(counts, 1) for k, v in sums.items()}
