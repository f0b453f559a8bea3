"""Exact ``F.adaptive_avg_pool2d`` semantics as dense matmuls (TPU-friendly).

The reference's IDLoss preprocessing chain and the training LPIPS multiscale
loss both use ``torch.nn.AdaptiveAvgPool2d`` / ``F.adaptive_avg_pool2d``
(`/root/reference/REFace/ldm/models/diffusion/ddpm.py:97,103,1784-1785`).
Adaptive pooling is NOT bilinear resampling: output bin *i* averages input
window ``[floor(i·In/Out), ceil((i+1)·In/Out))`` — a box filter when
downsampling and nearest-repeat when upsampling. Each axis is a fixed linear
map, so the whole op is two small static matmuls — no gathers, MXU-friendly,
and bit-comparable with the torch op.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _adaptive_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) row-stochastic matrix implementing 1-D adaptive avg pooling."""
    idx = np.arange(out_size, dtype=np.int64)
    starts = (idx * in_size) // out_size
    ends = -((-(idx + 1) * in_size) // out_size)  # ceil((i+1)·In/Out)
    w = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        w[i, starts[i] : ends[i]] = 1.0 / float(ends[i] - starts[i])
    return w


def adaptive_avg_pool(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """NHWC adaptive average pool with exact ``F.adaptive_avg_pool2d`` windows."""
    wh = jnp.asarray(_adaptive_matrix(x.shape[1], out_h))
    ww = jnp.asarray(_adaptive_matrix(x.shape[2], out_w))
    y = jnp.einsum("oh,bhwc->bowc", wh, x)
    return jnp.einsum("pw,bowc->bopc", ww, y)
