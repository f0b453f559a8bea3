"""Datasets — host-side loaders producing numpy batches (no torch DataLoader).

Capability parity with `/root/reference/REFace/ldm/data/`:

* :class:`VideoFramesDataset` — the inference-time dataset over precomputed
  cropped frames + parsing masks (`video_swap_dataset.py:86-409`): returns
  (image, prior_image, inpaint_image, inpaint_mask, frame_id) per frame with
  frames indexed ``0.png…N.png``, sequential order, inpaint = image ×
  (1 − face-region mask).
* :class:`CelebATrainDataset` — self-supervised inpainting pairs
  (`celebA.py:339-747`): GT image, preserve-list mask from ``Overall_mask``,
  TPS-deformed mask (the ``decow`` aug, celebA.py:83-135), reference = masked
  GT with flip/rotate/resize augs; 28000 train / 2000 val split (:377-390).
* :func:`test_bench_pairs` — fixed src/target pairing of the image benchmark
  (`test_bench_dataset.py:130,460,651` — CelebA ids 28000–30000, FFHQ, FF++).

Design: pure-python + numpy + PIL; each dataset yields ready-to-device numpy
dicts so the training/inference loops can double-buffer host→HBM transfers.
Augmentations that the reference runs via albumentations are expressed as
numpy/PIL ops with the same parameter ranges.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def _load_image(path: str, size: Optional[int] = None) -> np.ndarray:
    img = Image.open(path).convert("RGB")
    if size is not None:
        img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, dtype=np.float32) / 255.0


def _load_mask(path: str, size: Optional[int] = None) -> np.ndarray:
    img = Image.open(path)
    if size is not None:
        img = img.resize((size, size), Image.NEAREST)
    return np.asarray(img).astype(np.int32)


def normalize_img(x01: np.ndarray) -> np.ndarray:
    """[0,1] → [-1,1] (the reference's get_tensor Normalize(0.5, 0.5))."""
    return x01 * 2.0 - 1.0


def _box_blur(img01: np.ndarray, k: int) -> np.ndarray:
    """albumentations A.Blur: box filter with a random odd kernel in [3, 7]
    (celebA.py:354). Separable cumulative-sum implementation, edge-replicated."""
    if k <= 1:
        return img01
    pad = k // 2
    x = np.pad(img01, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    c = np.cumsum(x, axis=0)
    x = (c[k:] - c[:-k]) / k
    x = np.concatenate([c[k - 1 : k] / k, x], axis=0)
    c = np.cumsum(x, axis=1)
    x = (c[:, k:] - c[:, :-k]) / k
    x = np.concatenate([c[:, k - 1 : k] / k, x], axis=1)
    # cumsum accumulates float error slightly past the input range
    return np.clip(x, img01.min(), img01.max()).astype(np.float32)


def _elastic_transform(
    img01: np.ndarray,
    rng: np.random.Generator,
    alpha: float = 1.0,
    sigma: float = 50.0,
    alpha_affine: float = 50.0,
) -> np.ndarray:
    """albumentations A.ElasticTransform with its default parameters
    (celebA.py:355): a random affine fitted through three jittered control
    points (jitter ~ U(−alpha_affine, alpha_affine), the dominant term at
    alpha=1) plus a sigma-smoothed random displacement field scaled by alpha.
    The smooth field uses a coarse-noise bilinear upsample (same family as
    gaussian_filter(U(−1,1), sigma) without a scipy dependency)."""
    h, w = img01.shape[:2]
    # --- affine via 3 jittered points (albumentations' center square) ---
    sq = min(h, w) // 3
    c = np.asarray([w // 2, h // 2], np.float32)
    pts1 = np.float32([c + (-sq, -sq), c + (sq, -sq), c + (-sq, sq)])
    pts2 = pts1 + rng.uniform(-alpha_affine, alpha_affine, pts1.shape).astype(np.float32)
    # solve [x y 1] @ M = [x' y'] mapping OUTPUT → INPUT (backward warp)
    a_mat = np.concatenate([pts2, np.ones((3, 1), np.float32)], axis=1)
    m = np.linalg.solve(a_mat, pts1)  # (3, 2)
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    src_x = xs * m[0, 0] + ys * m[1, 0] + m[2, 0]
    src_y = xs * m[0, 1] + ys * m[1, 1] + m[2, 1]
    # --- smooth displacement field (coarse noise, cell size ~ sigma) ---
    if alpha > 0:
        cell = max(2, int(sigma))
        gh, gw = h // cell + 2, w // cell + 2
        coarse = rng.uniform(-1, 1, (gh, gw, 2)).astype(np.float32)
        fy = np.linspace(0, gh - 1.001, h)
        fx = np.linspace(0, gw - 1.001, w)
        iy, ix = fy.astype(int), fx.astype(int)
        ry, rx = (fy - iy)[:, None, None], (fx - ix)[None, :, None]
        d = (
            coarse[iy][:, ix] * (1 - ry) * (1 - rx)
            + coarse[iy][:, ix + 1] * (1 - ry) * rx
            + coarse[iy + 1][:, ix] * ry * (1 - rx)
            + coarse[iy + 1][:, ix + 1] * ry * rx
        ) * alpha
        src_x = src_x + d[..., 0]
        src_y = src_y + d[..., 1]
    # --- bilinear gather with edge clamp ---
    src_x = np.clip(src_x, 0, w - 1)
    src_y = np.clip(src_y, 0, h - 1)
    x0 = np.floor(src_x).astype(int)
    y0 = np.floor(src_y).astype(int)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    wx = (src_x - x0)[..., None]
    wy = (src_y - y0)[..., None]
    out = (
        img01[y0, x0] * (1 - wy) * (1 - wx)
        + img01[y0, x1] * (1 - wy) * wx
        + img01[y1, x0] * wy * (1 - wx)
        + img01[y1, x1] * wy * wx
    )
    return out.astype(np.float32)


@dataclasses.dataclass
class VideoFramesDataset:
    """Sequential frames `0.png…N.png` + masks; batches of `window` frames."""

    frames_dir: str
    masks_dir: Optional[str] = None
    image_size: int = 512
    window: int = 6
    remove_classes: Sequence[int] = (1, 2, 4, 5, 8, 9, 6, 7, 10, 11, 12, 17)

    def __len__(self) -> int:
        return len([f for f in os.listdir(self.frames_dir) if f.endswith(".png")])

    def frame_path(self, i: int) -> str:
        return os.path.join(self.frames_dir, f"{i}.png")

    def __iter__(self) -> Iterator[dict]:
        from vface_tpu.preprocess.masks import region_mask
        import jax.numpy as jnp

        n = len(self)
        for s0 in range(0, n, self.window):
            idx = list(range(s0, min(s0 + self.window, n)))
            imgs = np.stack([_load_image(self.frame_path(i), self.image_size) for i in idx])
            batch = {
                "image": normalize_img(imgs),
                "prior": normalize_img(imgs),  # prior == frame unless a DIFT prior dir is supplied
                "frame_ids": np.asarray(idx, np.int32),
            }
            if self.masks_dir is not None:
                masks = np.stack(
                    [
                        _load_mask(os.path.join(self.masks_dir, f"{i}.png"), self.image_size)
                        for i in idx
                    ]
                )
                face = np.asarray(region_mask(jnp.asarray(masks), self.remove_classes))
                keep = (1.0 - face)[..., None].astype(np.float32)
                batch["inpaint_mask"] = keep
                batch["inpaint_image"] = batch["image"] * keep
            yield batch


@dataclasses.dataclass
class CelebATrainDataset:
    """Self-supervised inpainting pairs from CelebAMask-HQ.

    dataset_dir layout (the reference's):
      CelebA-HQ-img/{i}.jpg, Overall_mask/{i}.png
    """

    dataset_dir: str
    image_size: int = 512
    split: str = "train"  # train: ids [0, 28000); val: [28000, 30000)
    remove_classes: Sequence[int] = (1, 2, 4, 5, 8, 9, 6, 7, 10, 11, 12, 17)
    arbitrary_mask_percent: float = 0.5
    seed: int = 0

    def __post_init__(self):
        lo, hi = (0, 28000) if self.split == "train" else (28000, 30000)
        img_dir = os.path.join(self.dataset_dir, "CelebA-HQ-img")
        ids = []
        if os.path.isdir(img_dir):
            for i in range(lo, hi):
                if os.path.exists(os.path.join(img_dir, f"{i}.jpg")):
                    ids.append(i)
        self.ids: List[int] = ids
        self._rng = np.random.default_rng(self.seed)

    def __len__(self) -> int:
        return len(self.ids)

    def _augment_reference(self, ref01: np.ndarray) -> np.ndarray:
        """The reference's albumentations pipeline (celebA.py:349-359), same
        ops / order / probabilities / parameter ranges:
        Resize(224) → HFlip(p=.5) → Rotate(limit=20, p=.5) → Blur(p=.3,
        kernel 3..7) → ElasticTransform(p=.3, alpha=1, sigma=50,
        alpha_affine=50)."""
        img = Image.fromarray((ref01 * 255).astype(np.uint8))
        img = img.resize((224, 224), Image.BILINEAR)
        if self._rng.uniform() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if self._rng.uniform() < 0.5:
            angle = float(self._rng.uniform(-20, 20))
            img = img.rotate(angle, resample=Image.BILINEAR)
        out = np.asarray(img, dtype=np.float32) / 255.0
        if self._rng.uniform() < 0.3:
            out = _box_blur(out, int(self._rng.integers(3, 8) | 1))
        if self._rng.uniform() < 0.3:
            out = _elastic_transform(out, self._rng, alpha=1.0, sigma=50.0,
                                     alpha_affine=50.0)
        return out

    def __getitem__(self, k: int) -> dict:
        from vface_tpu.preprocess.masks import region_mask
        import jax.numpy as jnp

        i = self.ids[k]
        img01 = _load_image(
            os.path.join(self.dataset_dir, "CelebA-HQ-img", f"{i}.jpg"), self.image_size
        )
        mask = _load_mask(
            os.path.join(self.dataset_dir, "Overall_mask", f"{i}.png"), self.image_size
        )
        face = np.asarray(region_mask(jnp.asarray(mask[None]), self.remove_classes))[0]
        keep = (1.0 - face)[..., None].astype(np.float32)
        # decow is applied to EVERY sample (celebA.py:475-477); it is not
        # gated by arbitrary_mask_percent (that governs the PbE bbox masks)
        keep = self._decow(keep)
        gt = normalize_img(img01)
        ref = self._augment_reference(img01 * (1.0 - keep[..., 0])[..., None])
        return {
            "gt_image": gt.astype(np.float32),
            "inpaint": (gt * keep).astype(np.float32),
            "mask": keep,
            "ref_image01": ref,
        }

    def _decow_noise(self) -> np.ndarray:
        """Interior control-point displacement of decow: a single
        ``(U−0.5)·scale`` draw per coordinate with ``scale ~ U(0.5, 1.0)``
        (celebA.py:88 ``noise = (torch.rand([a-2,a-2,2]) - 0.5) * scale``,
        scale drawn per sample at :475-477). ``noisy_grid`` only *adds* this
        matrix to the regular grid (thinplatespline/utils.py:66-73) — it does
        not multiply by another uniform draw."""
        a = 3
        scale = self._rng.uniform(0.5, 1.0)
        return (
            (self._rng.uniform(size=(a - 2, a - 2, 2)) - 0.5) * scale
        ).astype(np.float32)

    def _decow(self, keep: np.ndarray) -> np.ndarray:
        """The reference 'decow' mask deformation, exactly (celebA.py:83-96 +
        thinplatespline/utils.py:13-34): a 3×3 TPS control grid over [-1,1]
        whose single interior point is displaced by (U−0.5)·scale with
        scale ~ U(0.5, 1.0) drawn per sample (celebA.py:475-477). The warped
        mask stays continuous (bilinear grid_sample, no thresholding)."""
        import jax.numpy as jnp

        from vface_tpu.preprocess.tps import tps_warp

        a = 3
        xs = np.linspace(-1.0, 1.0, a, dtype=np.float32)
        gx, gy = np.meshgrid(xs, xs, indexing="ij")
        grid = np.stack([gx, gy], axis=-1)  # (3, 3, 2)
        noise = np.zeros_like(grid)
        noise[1:-1, 1:-1] = self._decow_noise()
        src = grid.reshape(1, -1, 2)  # regular grid (TPS 'X')
        dst = (grid + noise).reshape(1, -1, 2)  # noisy grid (TPS 'Y')
        # reference: sampling grid = TPS fitted X→Y evaluated at each output
        # pixel = our tps_warp(img, src=Y, dst=X)
        warped = tps_warp(jnp.asarray(keep[None]), jnp.asarray(dst), jnp.asarray(src))
        return np.asarray(warped)[0].astype(np.float32)

    def batches(self, batch_size: int, shuffle: bool = True) -> Iterator[dict]:
        order = np.arange(len(self))
        if shuffle:
            self._rng.shuffle(order)
        for s in range(0, len(order) - batch_size + 1, batch_size):
            items = [self[int(k)] for k in order[s : s + batch_size]]
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}


def test_bench_pairs(
    src_dir: str, tar_dir: str, mask_dir: Optional[str] = None, image_size: int = 512
) -> Iterator[dict]:
    """Fixed src↔target pairs of the image benchmark (test_bench_dataset.py).

    Pairs files by sorted order, as the bench datasets pair id lists.
    """
    srcs = sorted(os.listdir(src_dir))
    tars = sorted(os.listdir(tar_dir))
    for s, t in zip(srcs, tars):
        item = {
            "source": normalize_img(_load_image(os.path.join(src_dir, s), image_size)),
            "target": normalize_img(_load_image(os.path.join(tar_dir, t), image_size)),
            "name": os.path.splitext(t)[0],
        }
        if mask_dir is not None:
            item["mask"] = _load_mask(
                os.path.join(mask_dir, os.path.splitext(t)[0] + ".png"), image_size
            )
        yield item


@dataclasses.dataclass
class FFHQTrainDataset(CelebATrainDataset):
    """FFHQ variant of the training dataset (`ldm/data/ffhq.py:382-803`).

    Layout: images512/{00000..67999}.png + BiSeNet_mask/{i}.png (the
    `esitmate_FFHQ_mask.py` precompute); 68000 train / 2000 val split. The
    mask scheme is the 12-class seg12 with the FFHQ preserve list
    (project_ffhq.yaml).
    """

    remove_classes: Sequence[int] = tuple(
        c for c in range(12) if c not in (1, 2, 3, 5, 6, 7, 9) and c != 0
    )

    def __post_init__(self):
        lo, hi = (0, 68000) if self.split == "train" else (68000, 70000)
        img_dir = os.path.join(self.dataset_dir, "images512")
        ids = []
        if os.path.isdir(img_dir):
            for i in range(lo, hi):
                if os.path.exists(os.path.join(img_dir, f"{i:05d}.png")):
                    ids.append(i)
        self.ids = ids
        self._rng = np.random.default_rng(self.seed)

    def __getitem__(self, k: int) -> dict:
        from vface_tpu.preprocess.masks import region_mask
        import jax.numpy as jnp

        i = self.ids[k]
        img01 = _load_image(
            os.path.join(self.dataset_dir, "images512", f"{i:05d}.png"), self.image_size
        )
        mask = _load_mask(
            os.path.join(self.dataset_dir, "BiSeNet_mask", f"{i:05d}.png"), self.image_size
        )
        face = np.asarray(
            region_mask(jnp.asarray(mask[None]), self.remove_classes, num_classes=12)
        )[0]
        keep = (1.0 - face)[..., None].astype(np.float32)
        # decow is applied to EVERY sample (celebA.py:475-477); it is not
        # gated by arbitrary_mask_percent (that governs the PbE bbox masks)
        keep = self._decow(keep)
        gt = normalize_img(img01)
        ref = self._augment_reference(img01 * (1.0 - keep[..., 0])[..., None])
        return {
            "gt_image": gt.astype(np.float32),
            "inpaint": (gt * keep).astype(np.float32),
            "mask": keep,
            "ref_image01": ref,
        }


def ff_test_pairs(dataset_dir: str, image_size: int = 512) -> Iterator[dict]:
    """FF++ (FaceForensics++) image test bench pairing
    (`ldm/data/test_bench_dataset.py:651-720` test split): targets
    Val_target/{0000..0499}.png with target_mask, sources Val/{0500..0999}.png
    with src_mask — result i swaps source 500+i onto target i."""
    for i in range(500):
        tar = os.path.join(dataset_dir, "Val_target", f"{i:04d}.png")
        src = os.path.join(dataset_dir, "Val", f"{500 + i:04d}.png")
        if not (os.path.exists(tar) and os.path.exists(src)):
            continue
        item = {
            "source": normalize_img(_load_image(src, image_size)),
            "target": normalize_img(_load_image(tar, image_size)),
            "name": f"{i:04d}",
        }
        tm = os.path.join(dataset_dir, "target_mask", f"{i:04d}.png")
        if os.path.exists(tm):
            item["mask"] = _load_mask(tm, image_size)
        yield item
