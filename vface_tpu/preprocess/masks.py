"""Segmentation-mask semantics: CelebAMask-HQ 19-class / FFHQ 12-class tables.

Capability parity with the mask handling spread across the reference
(`/root/reference/REFace/configs/train.yaml:146-147` documents the 19-class
ids; `ldm/data/video_swap_dataset.py:49,104-111` and
`models/REFace/configs/project_ffhq.yaml:183-200` define preserve/remove
lists; `pretrained/face_parsing/face_parsing_demo.py:15-122` defines the
19→12 and FFHQ→12 class maps).

All lookups are one-hot/table based so they run as XLA gathers over uint8
index maps — no per-pixel python.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

# CelebAMask-HQ 19 classes (train.yaml:146-147):
# 0 background, 1 skin, 2 l_brow, 3 r_brow, 4 l_eye, 5 r_eye, 6 eye_g,
# 7 l_ear, 8 r_ear, 9 ear_r, 10 nose, 11 mouth, 12 u_lip, 13 l_lip,
# 14 neck, 15 neck_l, 16 cloth, 17 hair, 18 hat
CELEBA_CLASSES = 19

# Default face-region classes removed for the inpaint region at training
# (train.yaml remove_mask_tar): skin, brows, eyes, glasses, ears, earring,
# nose, mouth, lips, hair(17) — the train config list.
TRAIN_REMOVE = (1, 2, 4, 5, 8, 9, 6, 7, 10, 11, 12, 17)

# 12-class FFHQ scheme preserve list (video_swap_dataset.py:49): classes kept
# as background (NOT regenerated): 1,2,3,5,6,7,9 of seg12.
FFHQ12_PRESERVE = (1, 2, 3, 5, 6, 7, 9)

# 19→12 conversion (face_parsing_demo.py mapping): celeba id → seg12 id.
_CELEBA_TO_SEG12 = np.zeros(19, dtype=np.int32)
for src, dst in {
    0: 0,   # background
    1: 10,  # skin → face
    2: 2, 3: 2,     # brows → eyebrows
    4: 4, 5: 4,     # eyes
    6: 3,           # eyeglasses
    7: 8, 8: 8, 9: 8,  # ears + earring
    10: 6,          # nose
    11: 9,          # mouth interior
    12: 9, 13: 9,   # lips → mouth
    14: 7,          # neck
    15: 7,          # necklace → neck
    16: 11,         # cloth
    17: 1,          # hair
    18: 5,          # hat
}.items():
    _CELEBA_TO_SEG12[src] = dst


def celeba_to_seg12(mask: jnp.ndarray) -> jnp.ndarray:
    """uint8/int 19-class index map → 12-class scheme (XLA gather)."""
    table = jnp.asarray(_CELEBA_TO_SEG12)
    return table[mask.astype(jnp.int32)]


def region_mask(mask: jnp.ndarray, classes: Sequence[int], num_classes: int = 19) -> jnp.ndarray:
    """Binary (float32) mask of pixels whose class is in ``classes``.

    One boolean gather via a lookup table — O(HW), no per-class loop at runtime.
    """
    table = np.zeros(num_classes, dtype=np.float32)
    for c in classes:
        table[c] = 1.0
    return jnp.asarray(table)[mask.astype(jnp.int32)]


def inpaint_inputs(image: jnp.ndarray, mask: jnp.ndarray, remove: Sequence[int] = TRAIN_REMOVE):
    """Build (inpaint_image, inpaint_mask) like the datasets do.

    image (B,H,W,3) in [-1,1]; mask (B,H,W) class indices. inpaint_mask is 1
    where content is KEPT (the reference convention: mask multiplies the
    image, face region zeroed — video_swap_dataset.py:135-244).
    """
    face = region_mask(mask, remove)
    keep = (1.0 - face)[..., None]
    return image * keep, keep


def preserve_mask_seg12(mask12: jnp.ndarray, preserve: Sequence[int] = FFHQ12_PRESERVE) -> jnp.ndarray:
    """1 where the 12-class id is in the preserve list (stays original)."""
    return region_mask(mask12, preserve, num_classes=12)


def downsample_mask_to_latent(mask: jnp.ndarray, latent_size: int) -> jnp.ndarray:
    """(B,H,W,1) float mask → (B,h,h,1) by area pooling (ddpm.py resizes the
    inpaint mask to the 64² latent grid before concat, ddpm.py:1216)."""
    b, h, w, c = mask.shape
    fh, fw = h // latent_size, w // latent_size
    x = mask.reshape(b, latent_size, fh, latent_size, fw, c)
    return x.mean(axis=(2, 4))
