#!/bin/sh
# The train.sh operating point: CelebA-HQ, bs 1/shard, lr 1e-5.
set -e
python scripts/train.py --dataset_dir "${DATASET:-dataset/FaceData/CelebAMask-HQ}" \
  --logdir logs/vface --batch_size 1 --lr 1e-5 --max_steps 100000
