"""68-point facial landmarks — batched, on-device (the dlib replacement).

The reference runs dlib's C++ HOG detector + ensemble-of-regression-trees
landmarker per frame on the host, *inside the model's forward path*
(`/root/reference/REFace/ldm/models/diffusion/ddpm.py:704-708, 1068-1099` and
`src/utils/alignmengt.py:39-81`) — a GPU→CPU→GPU round trip every batch
(SURVEY hard-part #2). TPU-native replacement strategy:

1. :class:`LandmarkNet` — a small fully-convolutional heatmap regressor
   (stacked conv/pool → 68 heatmaps → soft-argmax) that runs batched under
   jit. Soft-argmax keeps it differentiable and avoids dynamic shapes.
   Weights are trainable from any 68-pt dataset (or distilled from dlib
   outputs offline); architecture is deliberately simple so a distilled
   checkpoint is cheap to produce.
2. :class:`UNetLandmarkHead` — parity port of the reference's
   ``LandmarkDetectionModel`` (ddpm.py:163-178): 640-ch UNet features →
   conv128 → maxpool → linear → 136, used by the optional landmark loss
   (ddpm.py:1692-1694, weight 0 in the shipped config).

The geometric consumers (`vface_tpu.preprocess.align.compute_quad`,
conditioning's 136-d vector) take plain (B, 68, 2) arrays, so a bit-accurate
dlib port can be slotted in later without touching callers.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

DEFAULT_WEIGHTS_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "..", "weights", "landmark_net.npz"
)


class LandmarkNet(nn.Module):
    """(B, H, W, 3) in [0,1] → (B, 68, 2) pixel coords in input scale.

    Conv trunk at 1/8 resolution (+2 dilated context convs) → 68 heatmaps →
    robust local decode.  Handles arbitrary (non-square) frame geometry.

    Domain-transfer design (v2/v3 — validated on the reference's real example
    photos, `/root/reference/REFace/examples/FaceSwap/`):

    * the raw RGB is reduced to a photometric-invariant 3-channel
      featurization — per-image standardized grayscale plus its x/y gradients
      (dlib's ERT also operates on grayscale differences, alignmengt.py:39-81);
    * detection always runs at a canonical ``detect_size`` scale regardless
      of input geometry, so the face-scale distribution seen at inference
      matches training;
    * heatmaps are supervised directly (Gaussian targets,
      `scripts/distill_landmarks.py`) and decoded with hard-argmax + a 3×3
      local soft-argmax refinement (`decode_heatmaps`) — a GLOBAL soft-argmax
      is dragged arbitrarily far by any secondary probability mass, which is
      exactly what out-of-domain photos produce.
    """

    width: int = 32
    detect_size: int = 256

    @nn.compact
    def heatmaps(self, x) -> jax.Array:
        """(B, H, W, 3) → heatmap logits (B, d/8, d/8, 68) in detect space."""
        b = x.shape[0]
        w = self.width
        if x.shape[1:3] != (self.detect_size, self.detect_size):
            x = jax.image.resize(
                x, (b, self.detect_size, self.detect_size, 3), method="bilinear"
            )
        # photometric-invariant featurization: standardized gray + gradients
        g = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
        mu = jnp.mean(g, axis=(1, 2, 3), keepdims=True)
        sd = jnp.std(g, axis=(1, 2, 3), keepdims=True) + 1e-5
        g = (g - mu) / sd
        gx = jnp.pad(g[:, :, 1:] - g[:, :, :-1], ((0, 0), (0, 0), (0, 1), (0, 0)))
        gy = jnp.pad(g[:, 1:] - g[:, :-1], ((0, 0), (0, 1), (0, 0), (0, 0)))
        x = jnp.concatenate([g, gx, gy], axis=-1)
        for i, (ch, stride) in enumerate(
            [(w, 2), (w * 2, 1), (w * 2, 2), (w * 4, 1), (w * 4, 2), (w * 8, 1)]
        ):
            x = nn.Conv(ch, (3, 3), strides=(stride, stride), padding=1,
                        param_dtype=jnp.float32, name=f"conv_{i}")(x)
            x = nn.GroupNorm(num_groups=8, name=f"gn_{i}")(x)
            x = jax.nn.relu(x)
        # dilated context: grows the receptive field to roughly the whole
        # face so the 68 channels stay mutually consistent (without this,
        # jaw/brow channels fire at locally-plausible but globally-wrong
        # spots on real photos)
        for i, dil in enumerate([2, 4]):
            x = nn.Conv(w * 8, (3, 3), kernel_dilation=(dil, dil), padding=dil,
                        param_dtype=jnp.float32, name=f"ctx_{i}")(x)
            x = nn.GroupNorm(num_groups=8, name=f"ctx_gn_{i}")(x)
            x = jax.nn.relu(x)
        return nn.Conv(68, (1, 1), param_dtype=jnp.float32, name="head")(x)

    def __call__(self, x):
        b, in_h, in_w, _ = x.shape
        heat = self.heatmaps(x)
        lm = decode_heatmaps(heat)  # (B, 68, 2) in heat-grid units
        hh, ww = heat.shape[1], heat.shape[2]
        return lm * jnp.asarray([in_w / ww, in_h / hh], jnp.float32)


def _local_soft_argmax(flat, ix, iy, xx, yy):
    """3×3 local soft-argmax around the (ix, iy) cells → (B, K) x/y coords."""
    near = (
        (jnp.abs(yy - iy[:, None, :]) <= 1.0) & (jnp.abs(xx - ix[:, None, :]) <= 1.0)
    )
    masked = jnp.where(near, flat, -jnp.inf)
    prob = jax.nn.softmax(masked, axis=1)  # mass only on the 3×3 window
    return jnp.sum(prob * xx, axis=1), jnp.sum(prob * yy, axis=1)


def _fit_similarity(canon, pts, wgt):
    """Weighted similarity fit canon → pts (rotation+scale+translation,
    Umeyama with reflection guard). canon (K, 2); pts/wgt (B, K, 2)/(B, K).
    Returns (A (B, 2, 2), t (B, 2))."""
    wsum = jnp.sum(wgt, axis=1, keepdims=True) + 1e-6  # (B, 1)
    mu_p = jnp.sum(wgt[..., None] * pts, axis=1) / wsum  # (B, 2)
    mu_c = jnp.sum(wgt[..., None] * canon[None], axis=1) / wsum
    pc = pts - mu_p[:, None]
    cc = canon[None] - mu_c[:, None]
    cov = jnp.einsum("bk,bki,bkj->bij", wgt, pc, cc) / wsum[..., None]  # (B, 2, 2)
    var_c = jnp.sum(wgt[..., None] * cc**2, axis=(1, 2)) / wsum[:, 0] + 1e-8
    u, s, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(jnp.einsum("bij,bjk->bik", u, vt))
    d = jnp.stack([jnp.ones_like(det), jnp.sign(det)], axis=-1)  # rotation only
    r = jnp.einsum("bij,bj,bjk->bik", u, d, vt)
    scale = jnp.sum(s * d, axis=-1) / var_c
    a = scale[:, None, None] * r
    t = mu_p - jnp.einsum("bij,bj->bi", a, mu_c)
    return a, t


def decode_heatmaps(heat: jax.Array) -> jax.Array:
    """Heatmap logits (B, h, w, 68) → (B, 68, 2) grid coords (x, y).

    Shape-constrained robust decode (the TPU-native stand-in for dlib ERT's
    cascade of shape-indexed regressors, alignmengt.py:39-81):

    1. per-channel global argmax → candidate + confidence (channel-softmax
       peak mass);
    2. confidence-weighted similarity fit of the canonical 68-point layout
       (`synthetic_faces.canonical_landmarks`) to the candidates — outlier
       channels get low confidence and barely influence the fit;
    3. per channel, re-argmax GATED to a radius around the fitted layout's
       expected position (off-face secondary modes are unreachable), twice
       (refit after the first gated pass);
    4. 3×3 local soft-argmax around the final cell for sub-cell accuracy
       (exact for Gaussian-shaped peaks).

    Static shapes, batched, jit-friendly.
    """
    from vface_tpu.preprocess.synthetic_faces import canonical_landmarks

    b, h, w, k = heat.shape
    flat = heat.reshape(b, h * w, k).astype(jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    yy = yy.reshape(-1)[None, :, None]  # (1, h*w, 1)
    xx = xx.reshape(-1)[None, :, None]
    canon = jnp.asarray(canonical_landmarks())  # (68, 2), unit face box

    prob_g = jax.nn.softmax(flat, axis=1)
    conf = jnp.max(prob_g, axis=1)  # (B, K) peak sharpness
    idx = jnp.argmax(flat, axis=1)
    ix = (idx % w).astype(jnp.float32)
    iy = (idx // w).astype(jnp.float32)
    cand = jnp.stack([ix, iy], axis=-1)  # (B, K, 2)

    wgt = conf
    for _ in range(2):
        a, t = _fit_similarity(canon, cand, wgt)
        exp_pt = jnp.einsum("bij,kj->bki", a, canon) + t[:, None]  # (B, K, 2)
        s_face = jnp.sqrt(jnp.abs(jnp.linalg.det(a)))[:, None, None]  # grid units
        r_gate = jnp.maximum(0.45 * s_face, 1.5)
        d2 = (xx - exp_pt[:, None, :, 0]) ** 2 + (yy - exp_pt[:, None, :, 1]) ** 2
        gated = jnp.where(d2 <= r_gate**2, flat, -jnp.inf)
        idx = jnp.argmax(gated, axis=1)
        ix = (idx % w).astype(jnp.float32)
        iy = (idx // w).astype(jnp.float32)
        cand = jnp.stack([ix, iy], axis=-1)
        # confidence of the gated peak under the channel softmax
        wgt = jnp.take_along_axis(prob_g, idx[:, None, :], axis=1)[:, 0, :]

    gx, gy = _local_soft_argmax(flat, ix, iy, xx, yy)
    return jnp.stack([gx, gy], axis=-1)


class UNetLandmarkHead(nn.Module):
    """Parity port of ddpm.py:163-178 (640ch 64² UNet feature → 136)."""

    @nn.compact
    def __call__(self, feats):
        x = nn.Conv(128, (3, 3), padding=1, param_dtype=jnp.float32, name="conv")(feats)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        b = x.shape[0]
        x = x.transpose(0, 3, 1, 2).reshape(b, -1)  # torch flatten order
        return nn.Dense(136, param_dtype=jnp.float32, name="fc")(x)


def landmarks_to_vector(landmarks68: jax.Array) -> jax.Array:
    """(B, 68, 2) → (B, 136) in the dlib x,y interleaved order the
    reference feeds to landmark_proj_out (ddpm.py:1086-1091: reshape(1,136))."""
    return landmarks68.reshape(landmarks68.shape[0], 136)


def load_default_landmark_params(path: str = DEFAULT_WEIGHTS_PATH):
    """Shipped LandmarkNet weights (distilled on procedurally rendered faces,
    `scripts/distill_landmarks.py --synthetic-faces`; see
    `vface_tpu.preprocess.synthetic_faces`). Returns the param tree, or None
    when no checkpoint is present (callers then fall back to random init —
    tiny/test mode)."""
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    from vface_tpu.runtime.checkpoint import load_params_npz

    net = LandmarkNet()
    like = jax.eval_shape(
        lambda r: net.init(r, jnp.zeros((1, 32, 32, 3)))["params"], jax.random.PRNGKey(0)
    )
    import numpy as np

    like = jax.tree_util.tree_map(lambda s: np.zeros(s.shape, s.dtype), like)
    return load_params_npz(path, like)
