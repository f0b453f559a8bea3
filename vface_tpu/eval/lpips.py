"""LPIPS perceptual distance (AlexNet variant), Flax.

Capability parity with `/root/reference/REFace/eval_tool/lpips/lpips.py`
(``LPIPS`` :8, AlexNet backbone) — used both as an eval metric and inside the
training loss (ddpm.py:634, 1779-1797). Structure: AlexNet conv stack taps at
relu1–relu5, unit-normalise each tap over channels, squared difference,
per-tap 1×1 linear weighting, spatial mean, sum over taps.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

_ALEX_PLAN = (
    # (ch, kernel, stride, padding)
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
_POOL_AFTER = (0, 1)  # maxpool follows taps 0 and 1 (and 4, but 4 is the last tap)

# LPIPS input scaling (lpips ScalingLayer)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class AlexNetFeatures(nn.Module):
    @nn.compact
    def __call__(self, x):
        taps = []
        h = x
        for i, (ch, k, s, p) in enumerate(_ALEX_PLAN):
            h = nn.Conv(ch, (k, k), strides=(s, s), padding=p, param_dtype=jnp.float32,
                        name=f"conv{i}")(h)
            h = jax.nn.relu(h)
            taps.append(h)
            if i in _POOL_AFTER:
                h = nn.max_pool(h, (3, 3), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """inputs in [-1, 1], NHWC. Returns (B,) perceptual distances."""

    @nn.compact
    def __call__(self, a, b):
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        feats = AlexNetFeatures(name="net")
        ta = feats((a - shift) / scale)
        tb = feats((b - shift) / scale)
        def unit(x):
            # exact reference formula (eval_tool/lpips/utils.py:6-8): the inner
            # 1e-16 dominates at dead-relu positions where the norm underflows;
            # dropping it diverges O(1) there
            return x / (jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-16) + 1e-10)

        total = 0.0
        for i, (fa, fb) in enumerate(zip(ta, tb)):
            na = unit(fa)
            nb = unit(fb)
            d2 = (na - nb) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, param_dtype=jnp.float32, name=f"lin{i}")(d2)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


def make_lpips_fn(params, model: LPIPS | None = None):
    """Closure (a, b) → (B,) distances, for the training loss's perceptual_fn."""
    model = model or LPIPS()

    def f(a, b):
        return model.apply({"params": params}, a, b)

    return f
