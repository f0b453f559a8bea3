"""End-to-end evaluate_all: directory of images → all four metric numbers.

Capability parity with `/root/reference/REFace/evaluate_all.sh` (which chains
the four eval_tool CLIs over a results directory). Trained eval checkpoints
don't exist in this environment, so the nets run at random init — the point
is the *pipeline*: loading from disk, batched device feature extraction, and
a report containing FID + ID retrieval + pose L2 + expression L2 (the
expression number in particular: `eval_tool/Expression/
expression_compare_face_recon.py:196-197,381` end-to-end).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from vface_tpu.eval.expression import FaceReconNet
from vface_tpu.eval.fid import InceptionV3Pool3
from vface_tpu.eval.harness import evaluate_all
from vface_tpu.eval.id_retrieval import IRSE50
from vface_tpu.eval.pose import Hopenet


def _write_dir(path, n, seed, size=64):
    os.makedirs(path)
    rng = np.random.default_rng(seed)
    for i in range(n):
        arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(path, f"{i:03d}.png"))


@pytest.mark.slow
def test_evaluate_all_end_to_end(tmp_path):
    n = 4
    dirs = {}
    for name, seed in (("results", 0), ("dataset", 1), ("source", 2), ("target", 3)):
        d = str(tmp_path / name)
        _write_dir(d, n, seed)
        dirs[name] = d

    k = jax.random.PRNGKey(0)
    eval_params = {
        "inception": InceptionV3Pool3().init(k, jnp.zeros((1, 299, 299, 3)))["params"],
        "arcface": IRSE50().init(k, jnp.zeros((1, 112, 112, 3)))["params"],
        "hopenet": Hopenet().init(k, jnp.zeros((1, 224, 224, 3)))["params"],
        "facerecon": FaceReconNet().init(k, jnp.zeros((1, 224, 224, 3)))["params"],
    }

    out_path = str(tmp_path / "report.jsonl")
    report = evaluate_all(
        dirs["results"], dirs["dataset"], dirs["source"], dirs["target"],
        eval_params, out_path=out_path, limit=n,
    )

    for key in ("fid", "id_top1", "id_top5", "id_mean_cosine", "pose_l2", "expression_l2"):
        assert key in report, f"missing metric {key}: {sorted(report)}"
        assert np.isfinite(report[key]), f"non-finite {key}={report[key]}"
    assert report["fid"] >= 0.0
    assert 0.0 <= report["id_top1"] <= 1.0

    # the report file appends a timestamped JSON line
    with open(out_path) as f:
        line = json.loads(f.read().strip())
    assert line["expression_l2"] == report["expression_l2"]
