#!/usr/bin/env python
"""Training CLI — the `main.py` equivalent.

Capability parity with `/root/reference/REFace/main.py` + `train.sh`:
CelebA-HQ self-supervised inpainting training with the REFace loss stack
(ε-MSE + DDIM-reconstruction ID/LPIPS), data-parallel over the device mesh.
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vface_tpu.utils.platform import apply_platform_from_env  # noqa: E402

apply_platform_from_env()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset_dir", required=True, help="CelebAMask-HQ root")
    ap.add_argument("--logdir", default="logs/vface")
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--max_steps", type=int, default=100_000)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--scale_lr", action="store_true")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import numpy as np

    from vface_tpu.data.datasets import CelebATrainDataset
    from vface_tpu.models import ModelConfig
    from vface_tpu.models.clip import clip_preprocess
    from vface_tpu.pipelines.train import TrainConfig
    from vface_tpu.pipelines.train_driver import DriverConfig, train
    from vface_tpu.runtime.checkpoint import TrainCheckpointer

    model_cfg = ModelConfig.tiny(image_size=32) if args.tiny else ModelConfig.sd_v1_inpaint()
    train_cfg = TrainConfig(learning_rate=args.lr)
    driver_cfg = DriverConfig(
        logdir=args.logdir,
        max_steps=args.max_steps,
        batch_size=args.batch_size,
        scale_lr=args.scale_lr,
        seed=args.seed,
    )

    ds = CelebATrainDataset(args.dataset_dir, image_size=model_cfg.image_size)
    if len(ds) == 0:
        raise SystemExit(f"no CelebA-HQ images found under {args.dataset_dir}")

    n_dev = len(jax.devices())
    global_bs = args.batch_size * n_dev

    def batches():
        for epoch in itertools.count():
            for b in ds.batches(global_bs):
                ref01 = b.pop("ref_image01")
                b["ref_clip"] = np.asarray(clip_preprocess(ref01, model_cfg.cond.clip.image_size))
                b["ref_face01"] = ref01
                b["landmarks"] = np.zeros((ref01.shape[0], 136), np.float32)
                yield b

    init_params = None
    if args.resume:
        state = TrainCheckpointer(os.path.join(args.logdir, "checkpoints")).restore_last()
        if state is not None:
            init_params = state["state"]["params"]
            print(f"[train] resumed from step {state['step']}")

    train(model_cfg, train_cfg, driver_cfg, batches(), init_params=init_params)


if __name__ == "__main__":
    main()
