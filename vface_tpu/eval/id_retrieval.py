"""ID-retrieval metric: top-1/top-5 accuracy + mean cosine similarity.

Capability parity with `/root/reference/REFace/eval_tool/ID_retrieval/
ID_retrieval.py` (ArcFace IR-SE-50 features, dot-product matrix, top-k at
:364-369, mask-aware face cropping): each swapped result is embedded and
retrieved against the gallery of source identities; top-k counts a hit when
the true source id is within the k nearest gallery embeddings. One batched
embedding pass + one (N, M) matmul — no python loops over pairs.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from vface_tpu.models.arcface import IRSE50, arcface_preprocess


def embed_faces(params, images01, model: IRSE50 | None = None, batch: int = 32) -> np.ndarray:
    """[0,1] face images → L2-normalised (N, 512) embeddings."""
    model = model or IRSE50()

    @jax.jit
    def f(x):
        e = model.apply({"params": params}, arcface_preprocess(x))
        return e / (jnp.linalg.norm(e, axis=-1, keepdims=True) + 1e-8)

    out = []
    for i in range(0, images01.shape[0], batch):
        out.append(np.asarray(f(jnp.asarray(images01[i : i + batch]))))
    return np.concatenate(out, axis=0)


def id_retrieval(
    swapped_emb: np.ndarray,   # (N, 512) embeddings of swapped results
    gallery_emb: np.ndarray,   # (M, 512) embeddings of source identities
    true_ids: np.ndarray,      # (N,) index into the gallery of each result's source
    topk: tuple = (1, 5),
) -> Dict[str, float]:
    sims = swapped_emb @ gallery_emb.T  # (N, M) cosine (both normalised)
    order = np.argsort(-sims, axis=1)
    res = {}
    for k in topk:
        hits = (order[:, :k] == true_ids[:, None]).any(axis=1)
        res[f"top{k}"] = float(hits.mean())
    res["mean_cosine"] = float(sims[np.arange(len(true_ids)), true_ids].mean())
    return res
