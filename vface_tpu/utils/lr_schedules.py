"""LR multiplier schedules — faithful ports of `ldm/lr_scheduler.py`.

The shipped config trains with ``LambdaLinearScheduler`` (10k-step warmup
from f_start 1e-6 to f_max 1, then linear decay toward f_min over an
effectively-infinite cycle — i.e. constant 1.0 after warmup;
`configs/train.yaml:23-31`). These return optax-compatible
``schedule(step) -> multiplier`` callables implemented with jnp so they can
live inside jitted optimizers; single-cycle semantics (the reference's
multi-cycle lists collapse to cycle 0 for the shipped config).
"""

from __future__ import annotations

import jax.numpy as jnp


def lambda_linear_schedule(
    warm_up_steps: int = 10_000,
    f_start: float = 1e-6,
    f_max: float = 1.0,
    f_min: float = 1.0,
    cycle_length: float = 1e13,
):
    """LambdaLinearScheduler (lr_scheduler.py:81-98), cycle 0."""

    def schedule(n):
        n = jnp.asarray(n, jnp.float32)
        warm = (f_max - f_start) / warm_up_steps * n + f_start
        lin = f_min + (f_max - f_min) * (cycle_length - n) / cycle_length
        return jnp.where(n < warm_up_steps, warm, lin)

    return schedule


def lambda_warmup_cosine_schedule(
    warm_up_steps: int,
    f_start: float,
    f_max: float,
    f_min: float,
    cycle_length: int,
):
    """LambdaWarmUpCosineScheduler2 (lr_scheduler.py:36-78), cycle 0."""

    def schedule(n):
        n = jnp.asarray(n, jnp.float32)
        warm = (f_max - f_start) / warm_up_steps * n + f_start
        t = jnp.clip((n - warm_up_steps) / (cycle_length - warm_up_steps), 0.0, 1.0)
        cos = f_min + 0.5 * (f_max - f_min) * (1 + jnp.cos(t * jnp.pi))
        return jnp.where(n < warm_up_steps, warm, cos)

    return schedule
