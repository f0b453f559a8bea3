#!/bin/sh
# evaluate_all.sh equivalent: FID + ID retrieval + pose + expression into a
# timestamped JSONL report (vface_tpu.eval.harness.evaluate_all).
set -e
python - <<'PY'
import os
from vface_tpu.eval.harness import evaluate_all
from vface_tpu.runtime.checkpoint import load_params_npz
# eval_params: converted checkpoints for inception/arcface/hopenet/facerecon
# (see vface_tpu.utils.torch_convert); supply via EVAL_PARAMS_DIR npz files.
eval_params = {}
d = os.environ.get("EVAL_PARAMS_DIR", "eval_params")
report = evaluate_all(
    os.environ.get("RESULTS", "results/test_bench_celeba"),
    os.environ.get("DATASET_IMGS", "data/celeba/tar"),
    os.environ.get("SRC_IMGS", "data/celeba/src"),
    os.environ.get("TAR_IMGS", "data/celeba/tar"),
    eval_params,
    out_path="Quantitative_Analysis/report.jsonl",
)
print(report)
PY
