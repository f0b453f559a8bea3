#!/usr/bin/env python
"""Image test bench — the `inference_test_bench.py` CLI.

Capability parity with `/root/reference/REFace/scripts/inference_test_bench.py`
(:145-567) + `inference_test_bench.sh`: run the plain 2-chunk CFG DDIM swap
over fixed source/target pairs (CelebA-HQ / FFHQ / FF++ bench layout) and
save 512² results for `vface_tpu.eval.harness.evaluate_all`.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vface_tpu.utils.platform import apply_platform_from_env  # noqa: E402

apply_platform_from_env()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--src_dir", required=True)
    ap.add_argument("--tar_dir", required=True)
    ap.add_argument("--mask_dir", default=None)
    ap.add_argument("--outdir", default="results/test_bench")
    ap.add_argument("--params", default=None)
    ap.add_argument("--aux_params", default=None)
    ap.add_argument("--ddim_steps", type=int, default=50)
    ap.add_argument("--scale", type=float, default=3.0)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from vface_tpu.data.datasets import test_bench_pairs
    from vface_tpu.models import ModelConfig, VFaceModel
    from vface_tpu.pipelines.image_swap import ImageSwapOptions, run_test_bench
    from vface_tpu.preprocess.landmarks import LandmarkNet
    from vface_tpu.runtime.checkpoint import load_params_npz

    cfg = ModelConfig.tiny(image_size=32) if args.tiny else ModelConfig.sd_v1_inpaint()
    model = VFaceModel(cfg)
    params = model.init(jax.random.PRNGKey(args.seed))
    if args.params:
        params = load_params_npz(args.params, params)
    lm_net = LandmarkNet()
    aux_params = {
        "landmark": lm_net.init(
            jax.random.PRNGKey(args.seed + 1), jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
        )["params"]
    }
    if args.aux_params:
        aux_params = load_params_npz(args.aux_params, aux_params)

    opts = ImageSwapOptions(
        ddim_steps=args.ddim_steps, cfg_scale=args.scale, image_size=cfg.image_size
    )
    pairs = test_bench_pairs(args.src_dir, args.tar_dir, args.mask_dir, cfg.image_size)
    os.makedirs(args.outdir, exist_ok=True)
    n = 0
    for name, out01 in run_test_bench(model, params, aux_params, pairs, opts, args.batch):
        Image.fromarray((np.clip(out01, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(args.outdir, f"{name}.png")
        )
        n += 1
    print(f"saved {n} swapped images to {args.outdir}")


if __name__ == "__main__":
    main()
