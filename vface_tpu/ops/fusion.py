"""FSAI / latent fusion primitives — the spectral & statistical blends of VFace.

Functional re-derivations of the fusion math in the reference:

* ``combine_fft_high_low``  — 1-D FFT split over the channel dim
  (`/root/reference/REFace/scripts/face_swap_utils.py:425-464`). Low-frequency
  bins come from the *branch* tensor, high-frequency bins from the *donor*.
* ``fft_fusion``            — 2-D circular-annulus spectral blend
  (face_swap_utils.py:225-250).
* ``lpf_fusion``            — Gaussian low/high-pass blend (face_swap_utils.py:281-308).
* ``adain_fusion``          — AdaIN over spatial dims (face_swap_utils.py:337-363).
* ``adain_fusion_attn``     — AdaIN over the channel dim (face_swap_utils.py:365-389).
* ``mix``                   — linear blend (face_swap_utils.py:189-199).
* ``temporal_gaussian``     — Gaussian frame window (ldm/models/pnp_utils.py:59-90).

TPU-first design note
---------------------
``combine_fft_high_low`` sits inside every hooked self-attention call, i.e. on
the innermost hot path. For *real* inputs the whole op

    out = Re(ifft( mask ⊙ fft(branch) + (1-mask) ⊙ fft(donor) ))

is linear, and equals

    out = donor + (branch - donor) ⊛ k_low ,   k_low = Re(ifft(mask))

a *circular convolution* along the channel axis. A circular convolution by a
fixed kernel is a matmul with a circulant matrix — a single (D, D) MXU matmul
per call instead of complex FFT round trips on the VPU. Both paths are provided
(`combine_fft_high_low` via jnp.fft, `combine_fft_high_low_circulant` via
matmul, with a cached circulant per (D, split)); they agree to float32
round-off and the circulant path is the default inside the attention kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# 1-D FFT high/low split (FSAI core)
# ---------------------------------------------------------------------------


def combine_fft_high_low(donor: jax.Array, branch: jax.Array, split_ratio: float = 0.8):
    """Low-freq bins [0, split) from `branch`, high-freq bins [split, D) from `donor`.

    Matches ``combine_fft_high_low(q1=donor, q2=branch)`` in the reference
    (face_swap_utils.py:425-464): FFT along the last dim, splice, ifft, take
    the real part (the spliced spectrum is not Hermitian, so Re() matters).
    Computation in float32/complex64 regardless of input dtype, like the
    reference's explicit ``.float()`` casts.
    """
    d = donor.shape[-1]
    split = int(d * split_ratio)
    fd = jnp.fft.fft(donor.astype(jnp.float32), axis=-1)
    fb = jnp.fft.fft(branch.astype(jnp.float32), axis=-1)
    mask = (np.arange(d) < split).astype(np.float32)
    combined = fb * mask + fd * (1.0 - mask)
    return jnp.fft.ifft(combined, axis=-1).real.astype(jnp.float32)


@functools.lru_cache(maxsize=32)
def _low_circulant(d: int, split: int) -> np.ndarray:
    """Circulant matrix K with (x @ K) == Re(ifft(mask * fft(x))) for real x.

    k = Re(ifft(mask)); out[n] = sum_m x[m] * k[(n-m) mod d]  =>  K[m, n] = k[(n-m) % d].
    """
    mask = (np.arange(d) < split).astype(np.float64)
    k = np.fft.ifft(mask).real  # real kernel: Re part of complex kernel suffices for real x
    idx = (np.arange(d)[None, :] - np.arange(d)[:, None]) % d  # K[m, n] = k[n - m]
    return k[idx].astype(np.float32)


def combine_fft_high_low_circulant(
    donor: jax.Array, branch: jax.Array, split_ratio: float = 0.8
):
    """MXU-friendly exact equivalent of :func:`combine_fft_high_low`.

    out = donor + (branch - donor) @ K_low — one (D, D) matmul on the MXU.
    """
    d = donor.shape[-1]
    split = int(d * split_ratio)
    k_low = jnp.asarray(_low_circulant(d, split))
    donor = donor.astype(jnp.float32)
    branch = branch.astype(jnp.float32)
    return donor + jnp.matmul(
        branch - donor, k_low, preferred_element_type=jnp.float32
    )


# ---------------------------------------------------------------------------
# 2-D spectral fusion (latent-space experiments; NHWC layout)
# ---------------------------------------------------------------------------


def _annulus_mask(h: int, w: int, center: float, center_exclude: float) -> np.ndarray:
    cy, cx = h // 2, w // 2
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    dist = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
    return ((dist <= center) & (dist > center_exclude)).astype(np.float32)


def fft_fusion(
    noise_a: jax.Array,
    noise_b: jax.Array,
    center: float = 16,
    center_exclude: float = 3,
):
    """2-D circular-annulus spectral blend (NHWC): annulus bins from B, rest from A.

    Mirrors face_swap_utils.py:225-250 (which is NCHW); FFT over the two
    spatial dims H, W with fftshift-centred annulus mask.
    """
    h, w = noise_a.shape[1], noise_a.shape[2]
    mask = jnp.asarray(_annulus_mask(h, w, center, center_exclude))[None, :, :, None]
    axes = (1, 2)
    fa = jnp.fft.fftshift(jnp.fft.fft2(noise_a.astype(jnp.float32), axes=axes), axes=axes)
    fb = jnp.fft.fftshift(jnp.fft.fft2(noise_b.astype(jnp.float32), axes=axes), axes=axes)
    combined = fa * (1.0 - mask) + fb * mask
    combined = jnp.fft.ifft2(jnp.fft.ifftshift(combined, axes=axes), axes=axes)
    return combined.real.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Gaussian low-pass fusion
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _gaussian_kernel2d(kernel_size: int, sigma: float) -> np.ndarray:
    coords = np.arange(kernel_size, dtype=np.float32) - kernel_size // 2
    grid = coords[None, :] ** 2 + coords[:, None] ** 2
    kernel = np.exp(-grid / (2 * sigma**2))
    return (kernel / kernel.sum()).astype(np.float32)


def gaussian_blur(x: jax.Array, kernel_size: int = 5, sigma: float = 1.0):
    """Depthwise Gaussian blur, NHWC, SAME zero padding (reference uses conv2d pad=k//2)."""
    c = x.shape[-1]
    k = jnp.asarray(_gaussian_kernel2d(kernel_size, sigma))
    kernel = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO with I=1 (depthwise)
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def lpf_fusion(noise_a: jax.Array, noise_b: jax.Array, kernel_size: int = 5, sigma: float = 1.0):
    """Structure (low-pass) from A + identity (high-pass) from B (face_swap_utils.py:281-308)."""
    structure = gaussian_blur(noise_a, kernel_size, sigma)
    identity = noise_b - gaussian_blur(noise_b, kernel_size, sigma)
    return structure + identity


# ---------------------------------------------------------------------------
# AdaIN fusions (torch .std() is unbiased — ddof=1 — reproduced here)
# ---------------------------------------------------------------------------


def _std_unbiased(x, axis, keepdims=True):
    n = np.prod([x.shape[a] for a in (axis if isinstance(axis, tuple) else (axis,))])
    var = jnp.var(x, axis=axis, keepdims=keepdims) * (n / max(n - 1, 1))
    return jnp.sqrt(var)


def adain_fusion(
    noise_a: jax.Array,
    noise_b: jax.Array,
    alpha: float = 0.71,
    beta: float = 1.0,
    normalized: bool = True,
):
    """AdaIN over spatial dims, NHWC (structure from A, stats from B).

    face_swap_utils.py:337-363; stats per (batch, channel) over H, W.
    """
    ax = (1, 2)
    mean_a = jnp.mean(noise_a, axis=ax, keepdims=True)
    std_a = _std_unbiased(noise_a, ax)
    mean_b = jnp.mean(noise_b, axis=ax, keepdims=True)
    std_b = _std_unbiased(noise_b, ax)
    normalized_a = (noise_a - mean_a) / (std_a + 1e-5) if normalized else noise_a
    fused = normalized_a * (std_b + 1e-5) + mean_b
    return ((1.0 - alpha) * noise_a + alpha * fused) * beta


def adain_fusion_attn(
    noise_a: jax.Array, noise_b: jax.Array, alpha: float = 0.71, normalized: bool = True
):
    """AdaIN over the last (channel) dim for attention q/k (face_swap_utils.py:365-389).

    normalized=True: renormalise by the *global* std of the fused tensor
    (the reference's ``fused.std()`` with no dims). alpha only scales the
    un-normalised branch, faithfully to the reference.
    """
    mean_a = jnp.mean(noise_a, axis=-1, keepdims=True)
    std_a = _std_unbiased(noise_a, -1)
    mean_b = jnp.mean(noise_b, axis=-1, keepdims=True)
    std_b = _std_unbiased(noise_b, -1)
    fused = (noise_a - mean_a) / (std_a + 1e-5) * std_b + mean_b
    if normalized:
        n = fused.size
        gstd = jnp.sqrt(jnp.var(fused) * (n / max(n - 1, 1)))
        return fused / (gstd + 1e-5)
    return alpha * fused


def mix(target: jax.Array, source: jax.Array, alpha: float = 0.5):
    """(1-alpha)*source + alpha*target (face_swap_utils.py:189-199)."""
    return (1.0 - alpha) * source + alpha * target


# ---------------------------------------------------------------------------
# Temporal Gaussian window over the frame axis
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _temporal_weights(t: int, window_size: int, sigma: float) -> np.ndarray:
    """(T, T) row-normalised Gaussian band matrix (pnp_utils.py:59-90 semantics)."""
    pad = window_size // 2
    offsets = np.arange(-pad, pad + 1, dtype=np.float32)
    gauss = np.exp(-0.5 * (offsets / sigma) ** 2)
    gauss = gauss / gauss.sum()
    w = np.zeros((t, t), dtype=np.float32)
    for ti in range(t):
        for i, off in enumerate(offsets):
            idx = ti + int(off)
            if 0 <= idx < t:
                w[ti, idx] = gauss[i]
    return w / w.sum(axis=1, keepdims=True)


def temporal_gaussian(x: jax.Array, window_size: int = 5, sigma: float = 1.0):
    """Gaussian-weighted frame average along axis 0: one (T, T) matmul."""
    t = x.shape[0]
    w = jnp.asarray(_temporal_weights(t, window_size, sigma))
    return jnp.einsum("ts,s...->t...", w, x.astype(jnp.float32))
