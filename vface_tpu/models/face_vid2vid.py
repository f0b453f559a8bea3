"""face-vid2vid — one-shot free-view talking-head generator, Flax/NDHWC.

Capability parity with `/root/reference/REFace/eval_tool/face_vid2vid/modules/`
(``keypoint_detector.py`` KPDetector :9 / HEEstimator :85, ``dense_motion.py``,
``generator.py`` OcclusionAwareGenerator :9, ``util.py`` blocks), used by the
reference to create driven comparison videos (`driven_demo_video.py:182-263`)
and to host Hopenet for the pose metric (ported separately in
`vface_tpu.eval.pose`). Architecture follows Wang et al., "One-Shot Free-View
Neural Talking-Head Synthesis" (CVPR 2021):

* appearance encoder: 2D downsamples → reshape to a 3D (D, H, W, C) feature
  volume;
* canonical 3D keypoint detector: 3D hourglass → K softmax heatmaps →
  expected 3D coordinates;
* head-pose/expression estimator: conv trunk → (yaw, pitch, roll) bins +
  translation + per-keypoint expression deltas; keypoints are composed as
  ``kp = R(yaw,pitch,roll) · kp_canonical + t + δ`` (keypoint_detector.py
  composition);
* dense motion: K sparse 3D flows from keypoint pairs + gaussian heatmap
  difference → 3D hourglass → K+1 masks → dense 3D flow + 2D occlusion map;
* generator: warp the source feature volume by the dense flow (trilinear),
  collapse depth, occlusion-masked 2D decoder with residual blocks.

Everything is shape-static and jittable; warps use batched gathers like
`vface_tpu.ops.warp.grid_sample` extended to 3D.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vface_tpu.models.arcface import FrozenBN


@dataclasses.dataclass(frozen=True)
class FV2VConfig:
    num_kp: int = 15
    block_expansion: int = 64
    max_features: int = 512
    depth: int = 16  # feature-volume depth D
    image_size: int = 256
    reshape_channel: int = 32

    @classmethod
    def tiny(cls):
        return cls(num_kp=5, block_expansion=8, max_features=32, depth=4,
                   image_size=32, reshape_channel=8)


class DownBlock2d(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, (3, 3), padding=1, param_dtype=jnp.float32, name="conv")(x)
        x = jax.nn.relu(FrozenBN(name="bn")(x))
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class UpBlock3d(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        b, d, h, w, c = x.shape
        x = jax.image.resize(x, (b, d, h * 2, w * 2, c), method="nearest")
        x = nn.Conv(self.ch, (3, 3, 3), padding=1, param_dtype=jnp.float32, name="conv")(x)
        return jax.nn.relu(FrozenBN(name="bn")(x))


class DownBlock3d(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, (3, 3, 3), padding=1, param_dtype=jnp.float32, name="conv")(x)
        x = jax.nn.relu(FrozenBN(name="bn")(x))
        return nn.avg_pool(x, (1, 2, 2), strides=(1, 2, 2))


class Hourglass3d(nn.Module):
    """Symmetric 3D encoder-decoder with skip concats (util.py Hourglass)."""

    base: int
    levels: int = 3

    @nn.compact
    def __call__(self, x):
        skips = [x]
        h = x
        for i in range(self.levels):
            h = DownBlock3d(min(self.base * 2 ** (i + 1), 256), name=f"down_{i}")(h)
            skips.append(h)
        out = skips.pop()
        for i in range(self.levels):
            out = UpBlock3d(min(self.base * 2 ** (self.levels - i - 1), 256), name=f"up_{i}")(out)
            out = jnp.concatenate([out, skips.pop()], axis=-1)
        return out


class AppearanceEncoder(nn.Module):
    """Source image → 3D feature volume (generator.py first stage)."""

    cfg: FV2VConfig

    @nn.compact
    def __call__(self, img):
        cfg = self.cfg
        h = nn.Conv(cfg.block_expansion, (7, 7), padding=3, param_dtype=jnp.float32, name="first")(img)
        h = jax.nn.relu(FrozenBN(name="first_bn")(h))
        h = DownBlock2d(cfg.block_expansion * 2, name="down_0")(h)
        h = DownBlock2d(min(cfg.block_expansion * 4, cfg.max_features), name="down_1")(h)
        h = nn.Conv(
            cfg.reshape_channel * cfg.depth, (1, 1), param_dtype=jnp.float32, name="to_volume"
        )(h)
        b, hh, ww, _ = h.shape
        return h.reshape(b, hh, ww, cfg.depth, cfg.reshape_channel).transpose(0, 3, 1, 2, 4)


class CanonicalKPDetector(nn.Module):
    """3D keypoints via softmax heatmap expectation (keypoint_detector.py:9-84)."""

    cfg: FV2VConfig

    @nn.compact
    def __call__(self, volume):
        cfg = self.cfg
        h = Hourglass3d(cfg.reshape_channel, name="hourglass")(volume)
        heat = nn.Conv(cfg.num_kp, (3, 3, 3), padding=1, param_dtype=jnp.float32, name="kp_head")(h)
        b, d, hh, ww, k = heat.shape
        flat = heat.reshape(b, d * hh * ww, k)
        prob = jax.nn.softmax(flat.astype(jnp.float32), axis=1)
        zs = jnp.linspace(-1, 1, d)
        ys = jnp.linspace(-1, 1, hh)
        xs = jnp.linspace(-1, 1, ww)
        zz, yy, xx = jnp.meshgrid(zs, ys, xs, indexing="ij")
        grid = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
        kp = jnp.einsum("bnk,nc->bkc", prob, grid)  # (B, K, 3) in [-1,1]
        return kp


class PoseExpressionNet(nn.Module):
    """Head pose bins + translation + expression deltas (HEEstimator :85-172)."""

    cfg: FV2VConfig
    bins: int = 66

    @nn.compact
    def __call__(self, img):
        cfg = self.cfg
        h = img
        for i, ch in enumerate([cfg.block_expansion, cfg.block_expansion * 2, cfg.max_features]):
            h = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1, param_dtype=jnp.float32, name=f"conv_{i}")(h)
            h = jax.nn.relu(FrozenBN(name=f"bn_{i}")(h))
        feat = jnp.mean(h, axis=(1, 2))
        yaw = nn.Dense(self.bins, param_dtype=jnp.float32, name="fc_yaw")(feat)
        pitch = nn.Dense(self.bins, param_dtype=jnp.float32, name="fc_pitch")(feat)
        roll = nn.Dense(self.bins, param_dtype=jnp.float32, name="fc_roll")(feat)
        t = nn.Dense(3, param_dtype=jnp.float32, name="fc_t")(feat)
        delta = nn.Dense(3 * cfg.num_kp, param_dtype=jnp.float32, name="fc_delta")(feat)
        return yaw, pitch, roll, t, delta.reshape(-1, cfg.num_kp, 3)


def _angles_from_bins(logits):
    prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    idx = jnp.arange(logits.shape[-1], dtype=jnp.float32)
    deg = jnp.sum(prob * idx, axis=-1) * 3.0 - 99.0
    return deg * jnp.pi / 180.0


def rotation_matrix(yaw, pitch, roll):
    """(B,) angles → (B, 3, 3) (keypoint_detector get_rotation_matrix)."""
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    z = jnp.zeros_like(yaw)
    o = jnp.ones_like(yaw)
    ry = jnp.stack([cy, z, sy, z, o, z, -sy, z, cy], -1).reshape(-1, 3, 3)
    rp = jnp.stack([o, z, z, z, cp, -sp, z, sp, cp], -1).reshape(-1, 3, 3)
    rr = jnp.stack([cr, -sr, z, sr, cr, z, z, z, o], -1).reshape(-1, 3, 3)
    return ry @ rp @ rr


def compose_keypoints(kp_canonical, yaw, pitch, roll, t, delta):
    """kp = R·kp_c + t + δ (keypoint_detector.py composition)."""
    r = rotation_matrix(_angles_from_bins(yaw), _angles_from_bins(pitch), _angles_from_bins(roll))
    kp = jnp.einsum("bij,bkj->bki", r, kp_canonical)
    return kp + t[:, None, :] + delta


def _kp_gaussians(kp, shape, sigma: float = 0.1):
    """(B,K,3) keypoints → (B,D,H,W,K) gaussian volumes."""
    d, h, w = shape
    zs = jnp.linspace(-1, 1, d)
    ys = jnp.linspace(-1, 1, h)
    xs = jnp.linspace(-1, 1, w)
    zz, yy, xx = jnp.meshgrid(zs, ys, xs, indexing="ij")
    grid = jnp.stack([xx, yy, zz], axis=-1)  # (D,H,W,3)
    diff = grid[None, :, :, :, None, :] - kp[:, None, None, None, :, :]
    return jnp.exp(-jnp.sum(diff**2, axis=-1) / (2 * sigma**2))


class DenseMotionNetwork(nn.Module):
    """Sparse kp flows → dense 3D flow + occlusion (dense_motion.py)."""

    cfg: FV2VConfig

    @nn.compact
    def __call__(self, volume, kp_driving, kp_source):
        cfg = self.cfg
        b, d, h, w, c = volume.shape
        heat_d = _kp_gaussians(kp_driving, (d, h, w))
        heat_s = _kp_gaussians(kp_source, (d, h, w))
        heat = heat_d - heat_s  # (B,D,H,W,K)
        inp = jnp.concatenate([volume, heat], axis=-1)
        feat = Hourglass3d(cfg.reshape_channel, name="hourglass")(inp)
        masks = nn.Conv(cfg.num_kp + 1, (3, 3, 3), padding=1, param_dtype=jnp.float32, name="mask")(feat)
        masks = jax.nn.softmax(masks.astype(jnp.float32), axis=-1)  # (B,D,H,W,K+1)
        # sparse motions: identity + per-kp translation (first-order w/o jacobian)
        zs = jnp.linspace(-1, 1, d)
        ys = jnp.linspace(-1, 1, h)
        xs = jnp.linspace(-1, 1, w)
        zz, yy, xx = jnp.meshgrid(zs, ys, xs, indexing="ij")
        ident = jnp.stack([xx, yy, zz], axis=-1)[None]  # (1,D,H,W,3)
        sparse = [jnp.broadcast_to(ident, (b, d, h, w, 3))]
        for k in range(cfg.num_kp):
            shift = (kp_source[:, k] - kp_driving[:, k])[:, None, None, None, :]
            sparse.append(ident + shift)
        sparse = jnp.stack(sparse, axis=-2)  # (B,D,H,W,K+1,3)
        flow = jnp.sum(sparse * masks[..., None], axis=-2)  # (B,D,H,W,3)
        occ_feat = jnp.mean(feat, axis=1)  # collapse depth
        occlusion = jax.nn.sigmoid(
            nn.Conv(1, (7, 7), padding=3, param_dtype=jnp.float32, name="occlusion")(occ_feat)
            .astype(jnp.float32)
        )
        return flow, occlusion


def warp_volume(volume, flow_grid):
    """Trilinear warp of (B,D,H,W,C) at normalised coords (B,D,H,W,3=x,y,z)."""
    b, d, h, w, c = volume.shape
    x = (flow_grid[..., 0] + 1) * 0.5 * (w - 1)
    y = (flow_grid[..., 1] + 1) * 0.5 * (h - 1)
    z = (flow_grid[..., 2] + 1) * 0.5 * (d - 1)

    def gather(zi, yi, xi):
        zi = jnp.clip(zi, 0, d - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = volume.reshape(b, d * h * w, c)
        idx = ((zi * h + yi) * w + xi).reshape(b, -1, 1)
        out = jnp.take_along_axis(flat, idx, axis=1)
        return out.reshape(zi.shape + (c,))

    x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    wx, wy, wz = (x - x0)[..., None], (y - y0)[..., None], (z - z0)[..., None]
    out = 0.0
    for dz, wz_ in ((0, 1 - wz), (1, wz)):
        for dy, wy_ in ((0, 1 - wy), (1, wy)):
            for dx, wx_ in ((0, 1 - wx), (1, wx)):
                out = out + gather(z0 + dz, y0 + dy, x0 + dx) * wz_ * wy_ * wx_
    return out


class Decoder2d(nn.Module):
    """Occlusion-masked 2D decoder back to image resolution."""

    max_features: int

    @nn.compact
    def __call__(self, feat2d):
        x = nn.Conv(self.max_features // 2, (3, 3), padding=1, param_dtype=jnp.float32, name="dec_in")(feat2d)
        x = jax.nn.relu(x)
        for i in range(2):
            bb, hh, ww, cc = x.shape
            x = jax.image.resize(x, (bb, hh * 2, ww * 2, cc), method="nearest")
            x = nn.Conv(max(cc // 2, 32), (3, 3), padding=1, param_dtype=jnp.float32, name=f"dec_up_{i}")(x)
            x = jax.nn.relu(x)
        out = nn.Conv(3, (7, 7), padding=3, param_dtype=jnp.float32, name="dec_out")(x)
        return jax.nn.sigmoid(out.astype(jnp.float32))


class OcclusionAwareGenerator(nn.Module):
    """Full pipeline: appearance volume → dense-motion warp → 2D decode
    (generator.py:9-120)."""

    cfg: FV2VConfig = FV2VConfig()

    def setup(self):
        self.appearance = AppearanceEncoder(self.cfg)
        self.kp_detector = CanonicalKPDetector(self.cfg)
        self.pose_net = PoseExpressionNet(self.cfg)
        self.dense_motion = DenseMotionNetwork(self.cfg)
        self.decoder = Decoder2d(self.cfg.max_features)

    def extract_kp(self, img):
        vol = self.appearance(img)
        kp_c = self.kp_detector(vol)
        yaw, pitch, roll, t, delta = self.pose_net(img)
        return compose_keypoints(kp_c, yaw, pitch, roll, t, delta)

    def __call__(self, source_img, driving_img):
        cfg = self.cfg
        vol = self.appearance(source_img)
        kp_c = self.kp_detector(vol)
        ys, ps, rs, ts, ds = self.pose_net(source_img)
        kp_source = compose_keypoints(kp_c, ys, ps, rs, ts, ds)
        yd, pd, rd, td, dd = self.pose_net(driving_img)
        kp_driving = compose_keypoints(kp_c, yd, pd, rd, td, dd)

        flow, occlusion = self.dense_motion(vol, kp_driving, kp_source)
        warped = warp_volume(vol, flow)
        b, d, h, w, c = warped.shape
        feat2d = warped.transpose(0, 2, 3, 1, 4).reshape(b, h, w, d * c)
        feat2d = feat2d * occlusion.astype(feat2d.dtype)
        return self.decoder(feat2d)
