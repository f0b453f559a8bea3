"""REFace image face swap + the image test bench — TPU pipelines.

Capability parity with:
* `/root/reference/REFace/scripts/inference_test_bench.py` (:145-567) — fixed
  src/target pairs, plain 2-chunk CFG DDIM (no inversion/hooks), 50 steps,
  scale 3.0, saving 512² results;
* `scripts/inference_swap_selected.py` / `one_inference.py` — folder swaps
  with align + paste-back (the alignment path is
  `vface_tpu.preprocess.align`, shared with the video pipeline).

The whole device portion (conditioning → encode → 50-step scan → decode) is
one jit per shape; batches stream through it.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vface_tpu.models.clip import clip_preprocess
from vface_tpu.models.ldm import VFaceModel
from vface_tpu.preprocess.landmarks import landmarks_to_vector
from vface_tpu.samplers.ddim import ddim_sample


@dataclasses.dataclass(frozen=True)
class ImageSwapOptions:
    ddim_steps: int = 50
    cfg_scale: float = 3.0  # inference_test_bench.sh; 3.5 for selected pairs
    image_size: int = 512


def swap_image_batch(
    model: VFaceModel,
    params,
    target: jax.Array,      # (B,S,S,3) aligned target crops in [-1,1]
    keep_mask: jax.Array,   # (B,S,S,1) 1 = background kept
    src_clip: jax.Array,    # (B,224,224,3) CLIP-normalised masked source faces
    src_face01: jax.Array,  # (B,h,w,3) [0,1] source for ArcFace
    landmarks136: Optional[jax.Array] = None,
    opts: ImageSwapOptions = ImageSwapOptions(),
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """The device core of the test bench (inference_test_bench.py:400-500):
    conditioning → inpaint encode → seeded noise → CFG DDIM → decode.
    Returns swapped crops (B,S,S,3) in [0,1].
    """
    b = target.shape[0]
    hl = model.cfg.latent_size
    rng = rng if rng is not None else jax.random.PRNGKey(42)

    tar01 = (target + 1.0) * 0.5
    tar_clip = clip_preprocess(tar01, model.cfg.cond.clip.image_size)
    cond = model.conditioning(params, src_clip, landmarks136, tar_clip, src_face01)
    uncond = model.uncond(params, b)

    inpaint = target * keep_mask
    z_inpaint = model.encode_first_stage(params, inpaint)
    mask_lat = jax.image.resize(keep_mask, (b, hl, hl, 1), method="bilinear")

    r_noise, r_samp = jax.random.split(rng)
    x_T = jax.random.normal(r_noise, (b, hl, hl, 4), jnp.float32)
    z0, _ = ddim_sample(
        model, params, x_T, cond, uncond, z_inpaint, mask_lat,
        num_steps=opts.ddim_steps, cfg_scale=opts.cfg_scale, rng=r_samp,
    )
    out = model.decode_first_stage(params, z0)
    return jnp.clip((out + 1.0) * 0.5, 0.0, 1.0)


def run_test_bench(
    model: VFaceModel,
    params,
    aux_params,
    pairs,
    opts: ImageSwapOptions = ImageSwapOptions(),
    batch_size: int = 4,
):
    """Stream `vface_tpu.data.datasets.test_bench_pairs` through the jitted core.

    Yields (name, swapped01) per pair. Masks must be present in the pairs
    (the bench datasets ship precomputed masks, test_bench_dataset.py).
    """
    from vface_tpu.preprocess.landmarks import LandmarkNet
    from vface_tpu.preprocess.masks import TRAIN_REMOVE, inpaint_inputs

    lm_net = LandmarkNet()
    core = jax.jit(
        partial(swap_image_batch, model, opts=opts),
        static_argnames=(),
    )

    buf, names = [], []

    def flush():
        nonlocal buf, names
        if not buf:
            return
        tar = jnp.stack([b["target"] for b in buf])
        mask = jnp.stack([jnp.asarray(b["mask"]) for b in buf])
        _, keep = inpaint_inputs(tar, mask, TRAIN_REMOVE)
        src01 = jnp.stack([(b["source"] + 1) * 0.5 for b in buf])
        src_clip = clip_preprocess(src01, model.cfg.cond.clip.image_size)
        lms = landmarks_to_vector(
            lm_net.apply({"params": aux_params["landmark"]}, (tar + 1) * 0.5)
        )
        out = core(params, tar, keep, src_clip, src01, lms)
        for n, o in zip(names, np.asarray(out)):
            yield n, o
        buf, names = [], []

    for item in pairs:
        buf.append(item)
        names.append(item["name"])
        if len(buf) == batch_size:
            yield from flush()
    yield from flush()
