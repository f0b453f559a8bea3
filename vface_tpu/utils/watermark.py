"""Invisible watermark + safety gate — the legacy `inference.py` capabilities.

Capability parity with `/root/reference/REFace/scripts/inference.py`:

* ``put_watermark`` (:78) uses the invisible-watermark package's DWT-DCT
  encoder with the byte payload "StableDiffusionV1" (:26-27). Here the same
  capability — an imperceptible, recoverable byte payload — is a
  dependency-free blockwise-DCT embedder: each bit flips the ordering of two
  mid-frequency DCT coefficients of an 8×8 luma block (the classic
  Koch-Zhao scheme the DWT-DCT method builds on).
* ``check_safety`` (:97-99) runs the CompVis StableDiffusionSafetyChecker —
  CLIP vision embeddings scored against concept embeddings with per-concept
  thresholds, flagged images replaced by black. :class:`SafetyChecker`
  reproduces that decision structure over our CLIP tower; concept embeddings
  and thresholds load from the checker checkpoint via the standard
  converters (cosine vs concept_embeds / special_care_embeds,
  safety_checker.py semantics).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

DEFAULT_PAYLOAD = b"StableDiffusionV1"  # inference.py:26


def _dct_mat(n: int = 8) -> np.ndarray:
    k = np.arange(n)
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m[0] = np.sqrt(1.0 / n)
    return m.astype(np.float64)


_DCT = _dct_mat()
# mid-frequency coefficient pair (robust to mild compression, imperceptible)
_C1, _C2 = (3, 1), (1, 3)
_MARGIN = 10.0


def _bits(payload: bytes) -> np.ndarray:
    return np.unpackbits(np.frombuffer(payload, np.uint8))


def _embed_block(blk: np.ndarray, bit: int, margin: float) -> np.ndarray:
    d = _DCT @ blk @ _DCT.T
    m = 0.5 * (d[_C1] + d[_C2])
    half = margin / 2
    if bit:
        d[_C1], d[_C2] = m + half, m - half
    else:
        d[_C1], d[_C2] = m - half, m + half
    return _DCT.T @ d @ _DCT


def _read_block_bit(blk: np.ndarray) -> int:
    d = _DCT @ blk @ _DCT.T
    return 1 if d[_C1] > d[_C2] else 0


def embed_watermark(img_u8: np.ndarray, payload: bytes = DEFAULT_PAYLOAD) -> np.ndarray:
    """Embed ``payload`` into the blue channel's 8×8 DCT blocks (the
    invisible-watermark default channel). img (H, W, 3) uint8 → uint8.

    Each block is verified after uint8 quantization and re-embedded with a
    doubled margin if rounding/clipping flipped its bit (≤ 3 passes)."""
    bits = _bits(payload)
    out = img_u8.copy()
    h8, w8 = out.shape[0] // 8, out.shape[1] // 8
    if h8 * w8 < len(bits):
        raise ValueError(f"image too small for {len(payload)}-byte payload")
    for bi, bit in enumerate(bits):
        by, bx = divmod(bi, w8)
        sl = (slice(by * 8, by * 8 + 8), slice(bx * 8, bx * 8 + 8), 2)
        margin = _MARGIN
        for _ in range(3):
            blk = _embed_block(out[sl].astype(np.float64), int(bit), margin)
            out[sl] = np.clip(np.round(blk), 0, 255).astype(np.uint8)
            if _read_block_bit(out[sl].astype(np.float64)) == int(bit):
                break
            margin *= 2.0
    return out


def extract_watermark(img_u8: np.ndarray, n_bytes: int = len(DEFAULT_PAYLOAD)) -> bytes:
    """Recover an ``n_bytes`` payload embedded by :func:`embed_watermark`."""
    ch = img_u8[..., 2].astype(np.float64)
    h8, w8 = ch.shape[0] // 8, ch.shape[1] // 8
    bits = []
    for by in range(h8):
        for bx in range(w8):
            if len(bits) >= n_bytes * 8:
                break
            blk = ch[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            d = _DCT @ blk @ _DCT.T
            bits.append(1 if d[_C1] > d[_C2] else 0)
        if len(bits) >= n_bytes * 8:
            break
    return np.packbits(np.asarray(bits, np.uint8)).tobytes()


class SafetyChecker:
    """StableDiffusionSafetyChecker decision structure over our CLIP tower.

    params: {"clip": CLIPVisionTower tree, "visual_projection": (W, P),
    "concept_embeds": (C, P), "concept_thresholds": (C,),
    "special_care_embeds": (S, P), "special_care_thresholds": (S,)}.
    ``check(images01)`` → (checked images with flagged ones blacked out,
    has_nsfw flags) — the reference's check_safety contract
    (inference.py:97-101; flagged outputs are replaced, :99 + safety_checker
    upstream semantics).
    """

    def __init__(self, vision_cfg=None):
        from vface_tpu.models.clip import CLIPVisionConfig, CLIPVisionTower

        self.cfg = vision_cfg or CLIPVisionConfig()
        self.tower = CLIPVisionTower(self.cfg)

    def _cos(self, a, b):
        a = a / (np.linalg.norm(a, axis=-1, keepdims=True) + 1e-8)
        b = b / (np.linalg.norm(b, axis=-1, keepdims=True) + 1e-8)
        return a @ b.T

    def check(
        self, params: dict, images01: np.ndarray, adjustment: float = 0.0
    ) -> Tuple[np.ndarray, np.ndarray]:
        import jax.numpy as jnp

        from vface_tpu.models.clip import clip_preprocess

        px = clip_preprocess(jnp.asarray(images01), self.cfg.image_size)
        pooled = self.tower.apply({"params": params["clip"]}, px)
        emb = np.asarray(pooled) @ np.asarray(params["visual_projection"])
        special = self._cos(emb, np.asarray(params["special_care_embeds"])) - (
            np.asarray(params["special_care_thresholds"]) + adjustment
        )
        # images tripping a special-care concept get a stricter bar (the
        # safety_checker's 0.01 adjustment)
        strict = (special > 0).any(axis=-1, keepdims=True) * 0.01
        concept = self._cos(emb, np.asarray(params["concept_embeds"])) - (
            np.asarray(params["concept_thresholds"]) + adjustment - strict
        )
        has_nsfw = (concept > 0).any(axis=-1)
        checked = np.array(images01, copy=True)
        checked[has_nsfw] = 0.0
        return checked, has_nsfw
