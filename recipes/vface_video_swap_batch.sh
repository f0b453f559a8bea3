#!/bin/sh
# The VFace_video_swap_batch.sh operating point (scale 3.0, 50 steps, 6-frame
# windows, fps 10) against a generated pairing config.
set -e
python scripts/generate_config.py --videos "${VIDEOS:-data/videos}" \
  --sources "${SOURCES:-data/sources}" --out swap_config.yaml
python scripts/vface_video_swap.py --config swap_config.yaml \
  --outdir results/video_swap --ddim_steps 50 --scale 3.0 --n_frames 6 --fps 10 \
  --params "${PARAMS:?set PARAMS=<converted weights npz>}" \
  --aux_params "${AUX_PARAMS:?set AUX_PARAMS=<aux nets npz>}"
