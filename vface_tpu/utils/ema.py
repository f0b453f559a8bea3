"""Exponential moving average of params — the LitEma equivalent.

Capability parity with `/root/reference/REFace/ldm/modules/ema.py` (used by
DDPM when ``use_ema`` is on; the shipped config trains with use_ema False but
monitors ``val/loss_simple_ema``): decay with warmup
``min(decay, (1 + updates) / (10 + updates))``, stored as a parallel pytree,
with swap-in/swap-out context handled functionally (return both trees instead
of mutating module buffers).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    params: dict
    updates: jnp.ndarray  # int32 counter


def ema_init(params) -> EmaState:
    return EmaState(jax.tree_util.tree_map(jnp.asarray, params), jnp.int32(0))


def ema_update(state: EmaState, new_params, decay: float = 0.9999) -> EmaState:
    updates = state.updates + 1
    d = jnp.minimum(decay, (1.0 + updates) / (10.0 + updates))
    ema = jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), state.params, new_params
    )
    return EmaState(ema, updates)
