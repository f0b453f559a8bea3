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

# per-dataset preserve lists (ID_retrieval.py:202-209)
RETRIEVAL_PRESERVE = {
    "celeba": (1, 2, 4, 5, 8, 9, 6, 7, 10, 11, 12),
    "ffhq": (1, 2, 3, 5, 6, 7, 9),
    "ff++": (1, 2, 4, 5, 8, 9),
    "none": tuple(range(21)),
}


def mask_crop(
    images01: np.ndarray, label_masks: np.ndarray, data_name: str = "celeba"
) -> np.ndarray:
    """The reference's mask-aware retrieval preprocessing
    (`ID_retrieval.py:172-229` ``MaskedImagePathDataset``): the image is
    bilinearly resized to 112², the integer parsing-label mask is binarised by
    the dataset's preserve list, bilinearly resized to 112² as a continuous
    map, and multiplied into the image **in [-1, 1] space** (masked-out
    pixels become mid-gray, not black). Returns [0, 1] images ready for
    :func:`embed_faces` (whose ``arcface_preprocess`` then runs the
    extract_feats chain: adaptive-pool 112→256, crop, pool → facenet —
    matching the reference's ``IDLoss.forward``/``extract_feats``
    :124-139 exactly).

    images01 (N, H, W, 3) in [0,1]; label_masks (N, Hm, Wm) integer labels.
    """
    preserve = RETRIEVAL_PRESERVE[data_name]
    n = images01.shape[0]
    img = jax.image.resize(
        jnp.asarray(images01, jnp.float32), (n, 112, 112, 3), "bilinear", antialias=False
    )
    binary = np.isin(np.asarray(label_masks), np.asarray(preserve)).astype(np.float32)
    m = jax.image.resize(
        jnp.asarray(binary)[..., None], (n, 112, 112, 1), "bilinear", antialias=False
    )
    masked_m11 = (img * 2.0 - 1.0) * m
    return np.asarray((masked_m11 + 1.0) * 0.5)


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
