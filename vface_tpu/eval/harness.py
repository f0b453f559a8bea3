"""evaluate_all — the quantitative-analysis orchestrator.

Capability parity with `/root/reference/REFace/evaluate_all.sh` (+ the four
eval_tool drivers): given a results directory, the dataset images, and the
source/target dirs, compute FID, ID-retrieval (top-1/top-5/cosine), pose L2
and expression L2, and append a timestamped report — one function instead of
four CLI processes, with all feature extraction batched on device.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


def _load_dir(path: str, size: int = 256, limit: Optional[int] = None) -> np.ndarray:
    from PIL import Image

    files = sorted(
        f for f in os.listdir(path) if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )[:limit]
    imgs = []
    for f in files:
        img = Image.open(os.path.join(path, f)).convert("RGB").resize((size, size))
        imgs.append(np.asarray(img, np.float32) / 255.0)
    return np.stack(imgs) if imgs else np.empty((0, size, size, 3), np.float32)


def evaluate_all(
    results_dir: str,
    dataset_dir: str,
    source_dir: str,
    target_dir: str,
    eval_params: Dict,
    out_path: Optional[str] = None,
    limit: Optional[int] = None,
) -> Dict[str, float]:
    """eval_params: {"inception": ..., "arcface": ..., "hopenet": ..., "facerecon": ...}
    (converted checkpoints; see vface_tpu.utils.torch_convert)."""
    import jax.numpy as jnp

    from vface_tpu.eval.expression import expression_l2, face_coeffs
    from vface_tpu.eval.fid import compute_fid
    from vface_tpu.eval.id_retrieval import embed_faces, id_retrieval
    from vface_tpu.eval.pose import head_pose, pose_l2

    results = _load_dir(results_dir, limit=limit)
    dataset = _load_dir(dataset_dir, limit=limit)
    sources = _load_dir(source_dir, limit=limit)
    targets = _load_dir(target_dir, limit=limit)

    report: Dict[str, float] = {}
    if "inception" in eval_params and len(dataset):
        report["fid"] = compute_fid(eval_params["inception"], results, dataset)
    if "arcface" in eval_params and len(sources):
        swapped_emb = embed_faces(eval_params["arcface"], results)
        gallery_emb = embed_faces(eval_params["arcface"], sources)
        ids = np.arange(min(len(swapped_emb), len(gallery_emb)))
        r = id_retrieval(swapped_emb[: len(ids)], gallery_emb, ids)
        report.update({f"id_{k}": v for k, v in r.items()})
    if "hopenet" in eval_params and len(targets):
        n = min(len(results), len(targets))
        pa = np.asarray(head_pose(eval_params["hopenet"], results[:n]))
        pb = np.asarray(head_pose(eval_params["hopenet"], targets[:n]))
        report["pose_l2"] = pose_l2(pa, pb)
    if "facerecon" in eval_params and len(targets):
        n = min(len(results), len(targets))
        ca = np.asarray(face_coeffs(eval_params["facerecon"], results[:n]))
        cb = np.asarray(face_coeffs(eval_params["facerecon"], targets[:n]))
        report["expression_l2"] = expression_l2(ca, cb)

    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        stamp = time.strftime("%Y%m%d_%H%M%S")
        with open(out_path, "a") as f:
            f.write(json.dumps({"ts": stamp, "results_dir": results_dir, **report}) + "\n")
    return report
