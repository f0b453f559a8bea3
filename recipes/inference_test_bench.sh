#!/bin/sh
# The image benchmark (inference_test_bench.sh): 50 steps, scale 3.0, both datasets.
set -e
for DS in celeba ffhq; do
  python scripts/inference_test_bench.py \
    --src_dir "data/${DS}/src" --tar_dir "data/${DS}/tar" --mask_dir "data/${DS}/mask" \
    --outdir "results/test_bench_${DS}" --ddim_steps 50 --scale 3.0 \
    --params "${PARAMS:?set PARAMS=<converted weights npz>}"
done
