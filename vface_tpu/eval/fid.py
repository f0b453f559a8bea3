"""FID — Fréchet Inception Distance, TPU-native feature extraction.

Capability parity with `/root/reference/REFace/eval_tool/fid/fid_score.py`
(+ ``inception.py``): InceptionV3 pool3 (2048-d) activations over result and
reference image sets, then the Fréchet distance

    d² = |mu1 − mu2|² + tr(C1 + C2 − 2·sqrt(C1·C2)).

Differences from the reference implementation, by design:

* feature extraction is a batched jitted Flax InceptionV3 (NHWC, frozen BN)
  instead of a torch DataLoader loop;
* the matrix square root is computed via eigendecomposition of the symmetric
  product ``C1^{1/2} C2 C1^{1/2}`` (numerically equivalent to scipy's
  ``sqrtm`` for SPD inputs, and differentiable/deterministic on accelerator),
  falling back to numpy for the final host-side reduction.

The InceptionV3 here follows the torchvision topology the FID net uses
(pool3 tap); weights load from the converted torch checkpoint via
``vface_tpu.utils.torch_convert`` — FID values are comparable only with the
converted weights, as with any FID implementation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vface_tpu.models.arcface import FrozenBN


class ConvBN(nn.Module):
    ch: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    padding: Tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, self.kernel, strides=(self.stride,) * 2,
                    padding=(self.padding, self.padding) if isinstance(self.padding, int) else
                    tuple((p, p) for p in self.padding),
                    use_bias=False, param_dtype=jnp.float32, name="conv")(x)
        return jax.nn.relu(FrozenBN(epsilon=1e-3, name="bn")(x))


class InceptionA(nn.Module):
    pool_ch: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="b1x1")(x)
        b5 = ConvBN(48, (1, 1), name="b5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=(2, 2), name="b5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="b3_1")(x)
        b3 = ConvBN(96, (3, 3), padding=(1, 1), name="b3_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=(1, 1), name="b3_3")(b3)
        bp = nn.avg_pool(
            x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)), count_include_pad=False
        )
        bp = ConvBN(self.pool_ch, (1, 1), name="bpool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), stride=2, name="b3")(x)
        bd = ConvBN(64, (1, 1), name="bd_1")(x)
        bd = ConvBN(96, (3, 3), padding=(1, 1), name="bd_2")(bd)
        bd = ConvBN(96, (3, 3), stride=2, name="bd_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    ch7: int

    @nn.compact
    def __call__(self, x):
        c = self.ch7
        b1 = ConvBN(192, (1, 1), name="b1x1")(x)
        b7 = ConvBN(c, (1, 1), name="b7_1")(x)
        b7 = ConvBN(c, (1, 7), padding=(0, 3), name="b7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=(3, 0), name="b7_3")(b7)
        bd = ConvBN(c, (1, 1), name="bd_1")(x)
        bd = ConvBN(c, (7, 1), padding=(3, 0), name="bd_2")(bd)
        bd = ConvBN(c, (1, 7), padding=(0, 3), name="bd_3")(bd)
        bd = ConvBN(c, (7, 1), padding=(3, 0), name="bd_4")(bd)
        bd = ConvBN(192, (1, 7), padding=(0, 3), name="bd_5")(bd)
        bp = nn.avg_pool(
            x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)), count_include_pad=False
        )
        bp = ConvBN(192, (1, 1), name="bpool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="b3_1")(x)
        b3 = ConvBN(320, (3, 3), stride=2, name="b3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="b7_1")(x)
        b7 = ConvBN(192, (1, 7), padding=(0, 3), name="b7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=(3, 0), name="b7_3")(b7)
        b7 = ConvBN(192, (3, 3), stride=2, name="b7_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    """pool="avg" → FIDInceptionE_1 (Mixed_7b); pool="max" → FIDInceptionE_2
    (Mixed_7c), which swaps the pool branch to max pooling
    (eval_tool/fid/inception.py:294-321)."""

    pool: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="b1x1")(x)
        b3 = ConvBN(384, (1, 1), name="b3_1")(x)
        b3a = ConvBN(384, (1, 3), padding=(0, 1), name="b3_2a")(b3)
        b3b = ConvBN(384, (3, 1), padding=(1, 0), name="b3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBN(448, (1, 1), name="bd_1")(x)
        bd = ConvBN(384, (3, 3), padding=(1, 1), name="bd_2")(bd)
        bda = ConvBN(384, (1, 3), padding=(0, 1), name="bd_3a")(bd)
        bdb = ConvBN(384, (3, 1), padding=(1, 0), name="bd_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool == "max":
            bp = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        else:
            bp = nn.avg_pool(
                x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)), count_include_pad=False
            )
        bp = ConvBN(192, (1, 1), name="bpool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Pool3(nn.Module):
    """299² input in [-1, 1] → 2048-d pool3 features."""

    @nn.compact
    def __call__(self, x):
        h = ConvBN(32, (3, 3), stride=2, name="Conv2d_1a")(x)
        h = ConvBN(32, (3, 3), name="Conv2d_2a")(h)
        h = ConvBN(64, (3, 3), padding=(1, 1), name="Conv2d_2b")(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = ConvBN(80, (1, 1), name="Conv2d_3b")(h)
        h = ConvBN(192, (3, 3), name="Conv2d_4a")(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = InceptionA(32, name="Mixed_5b")(h)
        h = InceptionA(64, name="Mixed_5c")(h)
        h = InceptionA(64, name="Mixed_5d")(h)
        h = InceptionB(name="Mixed_6a")(h)
        h = InceptionC(128, name="Mixed_6b")(h)
        h = InceptionC(160, name="Mixed_6c")(h)
        h = InceptionC(160, name="Mixed_6d")(h)
        h = InceptionC(192, name="Mixed_6e")(h)
        h = InceptionD(name="Mixed_7a")(h)
        h = InceptionE(name="Mixed_7b")(h)
        h = InceptionE(pool="max", name="Mixed_7c")(h)
        return jnp.mean(h, axis=(1, 2))  # pool3, 2048-d


def inception_preprocess(images01: jax.Array) -> jax.Array:
    b = images01.shape[0]
    x = jax.image.resize(images01, (b, 299, 299, 3), method="bilinear")
    return x * 2.0 - 1.0


def activation_statistics(feats: np.ndarray):
    """(N, 2048) → (mu, sigma)."""
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Fréchet distance between two Gaussians (fid_score.py semantics).

    sqrtm(C1·C2) via eigendecomposition of the symmetrised product — exact
    for SPD matrices, stable without scipy.
    """
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    # sqrt of sigma1 (symmetric PSD)
    w1, v1 = np.linalg.eigh(sigma1 + eps * np.eye(sigma1.shape[0]))
    s1_half = (v1 * np.sqrt(np.maximum(w1, 0))) @ v1.T
    inner = s1_half @ sigma2 @ s1_half
    w, _ = np.linalg.eigh((inner + inner.T) / 2)
    tr_covmean = np.sum(np.sqrt(np.maximum(w, 0)))
    d = float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * tr_covmean)
    # the eps regularisation can push an exact-zero distance slightly negative
    return max(d, 0.0)


def compute_fid(params, images_a01, images_b01, batch: int = 32) -> float:
    """End-to-end FID between two [0,1] image sets (numpy/jnp arrays)."""
    model = InceptionV3Pool3()

    @jax.jit
    def feats(x):
        return model.apply({"params": params}, inception_preprocess(x))

    def extract(imgs):
        out = []
        for i in range(0, imgs.shape[0], batch):
            out.append(np.asarray(feats(jnp.asarray(imgs[i : i + batch]))))
        return np.concatenate(out, axis=0)

    mu1, s1 = activation_statistics(extract(images_a01))
    mu2, s2 = activation_statistics(extract(images_b01))
    return frechet_distance(mu1, s1, mu2, s2)
