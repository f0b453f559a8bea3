"""DIFT — diffusion-feature correspondences between source and target faces.

Capability parity with `/root/reference/REFace/scripts/make_priors.py:1-60`
(which uses ``dift.src.models.dift_sd`` SDFeaturizer): extract an
intermediate UNet feature map for each image at a fixed noise level, then
match target locations to source locations by cosine similarity, producing a
"prior" image that warps source appearance into target geometry (Tang et al.,
"Emergent Correspondence from Image Diffusion", 2023).

TPU-native form: both images ride one batched UNet forward (our UNet already
returns per-output-block features, openaimodel.py:897-905 parity); the
correspondence argmax is one (Ht·Wt, Hs·Ws) similarity matmul on the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vface_tpu.models.ldm import VFaceModel


def dift_features(
    model: VFaceModel,
    params,
    images: jax.Array,       # (B,S,S,3) in [-1,1]
    cond: jax.Array,         # (B,1,D) conditioning (the reference uses a text/null prompt)
    t: int = 261,            # DIFT's default SD timestep
    block: int = -4,         # which output-block feature to use
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """(B, h, w, C) feature maps at the chosen UNet output block."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    b = images.shape[0]
    hl = model.cfg.latent_size
    z = model.encode_first_stage(params, images)
    noise = jax.random.normal(rng, z.shape)
    tt = jnp.full((b,), t, jnp.int32)
    z_t = model.q_sample(z, tt, noise)
    # neutral inpaint channels: full image, keep-all mask
    x9 = model.build_unet_input(z_t, z, jnp.ones((b, hl, hl, 1)))
    _, feats = model.apply_model(params, x9, tt, cond, return_features=True)
    return feats[block]


def correspondences(feat_tar: jax.Array, feat_src: jax.Array) -> jax.Array:
    """Per-pixel source coordinates for each target location.

    feat_* (h, w, C) → (h, w, 2) int32 (x, y) into the source grid, by
    argmax cosine similarity.
    """
    h, w, c = feat_tar.shape
    ft = feat_tar.reshape(-1, c)
    fs = feat_src.reshape(-1, c)
    ft = ft / (jnp.linalg.norm(ft, axis=-1, keepdims=True) + 1e-8)
    fs = fs / (jnp.linalg.norm(fs, axis=-1, keepdims=True) + 1e-8)
    sim = ft @ fs.T  # (ht*wt, hs*ws) — one MXU matmul
    idx = jnp.argmax(sim, axis=-1)
    ys, xs = idx // w, idx % w
    return jnp.stack([xs, ys], axis=-1).reshape(h, w, 2).astype(jnp.int32)


def make_prior(
    model: VFaceModel,
    params,
    target: jax.Array,   # (S,S,3) [-1,1]
    source: jax.Array,   # (S,S,3) [-1,1]
    cond: jax.Array,     # (2,1,D)
    t: int = 261,
    block: int = -4,
) -> jax.Array:
    """Warp source appearance into target geometry via DIFT correspondences.

    Returns the prior image (S,S,3) — the reference feeds these as the
    ``prior`` entry of VideoDataset (video_swap_dataset.py) for inversion.
    """
    feats = dift_features(
        model, params, jnp.stack([target, source]), cond, t=t, block=block
    )
    corr = correspondences(feats[0], feats[1])  # target loc → source loc (feature grid)
    s = target.shape[0]
    hf = feats.shape[1]
    scale = s // hf
    # upsample correspondence to pixel grid and gather source pixels
    corr_px = jax.image.resize(
        corr.astype(jnp.float32), (s, s, 2), method="nearest"
    ) * scale
    xi = jnp.clip(corr_px[..., 0].astype(jnp.int32), 0, s - 1)
    yi = jnp.clip(corr_px[..., 1].astype(jnp.int32), 0, s - 1)
    return source[yi, xi]
