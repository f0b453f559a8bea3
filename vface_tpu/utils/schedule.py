"""Diffusion noise schedules and DDIM timestep machinery.

Re-derivation of the schedule math used by the reference LDM stack
(`/root/reference/REFace/ldm/modules/diffusionmodules/util.py:17-96` and
`ldm/models/diffusion/ddpm.py` register_schedule): linear / cosine / sqrt beta
schedules, cumulative-alpha tables, DDIM sub-sequence selection and the
(sigma, alpha, alpha_prev) triplets of Song et al. (arXiv:2010.02502).

Everything here is plain numpy evaluated once at setup; the resulting tables are
closed over by jitted samplers as constant device arrays, so no schedule math
ever appears inside a traced scan body.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import numpy as np

Schedule = Literal["linear", "cosine", "sqrt_linear", "sqrt"]


def make_beta_schedule(
    schedule: Schedule = "linear",
    n_timestep: int = 1000,
    linear_start: float = 0.00085,
    linear_end: float = 0.0120,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedule table, float64 for accuracy (cast later)."""
    if schedule == "linear":
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64) ** 2
        )
    elif schedule == "cosine":
        timesteps = (np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s)
        alphas = timesteps / (1 + cosine_s) * np.pi / 2
        alphas = np.cos(alphas) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, a_min=0, a_max=0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas


def make_ddim_timesteps(
    num_ddim_timesteps: int,
    num_ddpm_timesteps: int = 1000,
    method: Literal["uniform", "quad"] = "uniform",
) -> np.ndarray:
    """DDIM timestep subsequence (ascending), +1 shifted like the reference.

    `uniform` with S=50, T=1000 yields [1, 21, ..., 961, 981] (reference
    util.py:46-60). NOTE the reference video driver starts sampling from the
    inversion latents hardcoded at t=961 (`VFace_inference_batch.py:541`) —
    the *second-to-last* entry — while the first sampling step runs at t=981;
    the rebuild reproduces that exact behavior (video_swap.py start_code).
    """
    if method == "uniform":
        c = num_ddpm_timesteps // num_ddim_timesteps
        ddim_timesteps = np.asarray(list(range(0, num_ddpm_timesteps, c)))
    elif method == "quad":
        ddim_timesteps = (
            np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2
        ).astype(int)
    else:
        raise NotImplementedError(method)
    # The +1 shift can reach T for step counts that don't divide T (e.g. S=3,
    # T=1000 → ..., 1000) — the reference would index alphas_cumprod[T] and
    # crash there (its shape assert is commented out, util.py:56). Clamp to
    # the valid range; identical to the reference for divisor step counts.
    return np.minimum(ddim_timesteps + 1, num_ddpm_timesteps - 1)


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Full DDPM alpha/sigma tables (length = num_timesteps)."""

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray
    sqrt_recip_alphas_cumprod: np.ndarray
    sqrt_recipm1_alphas_cumprod: np.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])

    @classmethod
    def create(
        cls,
        schedule: Schedule = "linear",
        timesteps: int = 1000,
        linear_start: float = 0.00085,
        linear_end: float = 0.0120,
        cosine_s: float = 8e-3,
    ) -> "DiffusionSchedule":
        betas = make_beta_schedule(schedule, timesteps, linear_start, linear_end, cosine_s)
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas, axis=0)
        alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
        f32 = lambda a: a.astype(np.float32)
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        )


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """DDIM sub-schedule derived from a :class:`DiffusionSchedule`.

    Mirrors `make_ddim_sampling_parameters` (reference util.py:63-74) plus the
    inversion-specific alpha pairs used by the custom inversion update at
    `ddim_w_inv.py:442-449`:

      alpha_next[i] = alphas_cumprod[timesteps[i]]
      alpha_cur[i]  = alphas_cumprod[max(0, timesteps[i] - T//S)]
    """

    timesteps: np.ndarray  # ascending, shape (S,)
    alphas: np.ndarray  # a_t per DDIM index
    alphas_prev: np.ndarray
    sqrt_one_minus_alphas: np.ndarray
    sigmas: np.ndarray
    # inversion tables
    inv_alpha_next: np.ndarray
    inv_alpha_cur: np.ndarray

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])

    @classmethod
    def create(
        cls,
        base: DiffusionSchedule,
        num_steps: int,
        eta: float = 0.0,
        method: Literal["uniform", "quad"] = "uniform",
    ) -> "DDIMSchedule":
        ts = make_ddim_timesteps(num_steps, base.num_timesteps, method)
        acp = base.alphas_cumprod.astype(np.float64)
        alphas = acp[ts]
        alphas_prev = np.concatenate([[float(acp[0])], acp[ts[:-1]]])
        sigmas = eta * np.sqrt(
            (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
        )
        stride = base.num_timesteps // len(ts)
        cur_ts = np.maximum(0, ts - stride)
        f32 = lambda a: np.asarray(a, dtype=np.float32)
        return cls(
            timesteps=np.asarray(ts, dtype=np.int32),
            alphas=f32(alphas),
            alphas_prev=f32(alphas_prev),
            sqrt_one_minus_alphas=f32(np.sqrt(1.0 - alphas)),
            sigmas=f32(sigmas),
            inv_alpha_next=f32(acp[ts]),
            inv_alpha_cur=f32(acp[cur_ts]),
        )


def timestep_embedding(timesteps, dim: int, max_period: int = 10000):
    """Sinusoidal timestep embedding, [cos | sin] order (reference util.py:151-171).

    Accepts a traced jnp array of shape (B,); returns (B, dim) float32.
    """
    import jax.numpy as jnp

    half = dim // 2
    freqs = jnp.exp(
        -np.log(max_period) * jnp.arange(0, half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate([embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding
