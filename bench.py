"""Benchmark: swapped frames/sec/chip at 512px, 50-step DDIM (BASELINE.md north star).

Times the flagship hot path on the real chip: the 3-chunk VFace denoiser step
(full SD-v1-4 9ch UNet, bf16, FSAI injection at input-block attn1, 6-frame
window ⇒ batch 18) — the dominant cost of the reference pipeline
(`scripts/VFace_inference_batch.py:580-594`: 50 × 3-chunk UNet forwards per
window, plus 50 inversion forwards).

Measurement notes (tunneled-TPU backend):
* every distinct jitted program pays a remote compile (~1 min), so the init
  and the step are each ONE jitted program;
* ``block_until_ready`` is a no-op on this backend — completion is forced by
  fetching a scalar with ``device_get``;
* steps are chained (each consumes the previous latent), dispatched
  back-to-back, and fetched once — so the tunnel round trip is amortised,
  like the production `lax.scan` sampler.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline: the torch reference path measures ≈0.30 swapped frames/s on an
A100 at the same operating point (50-step DDIM + 3-chunk CFG batch, 512²).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

A100_BASELINE_FPS = 0.30


def main():
    from vface_tpu.models import InjectionSpec, ModelConfig, VFaceModel
    from vface_tpu.ops.attention import FusionConfig

    frames = 6  # the reference window (VFace_inference_batch.py:783-787)
    steps = 50
    model = VFaceModel(ModelConfig.sd_v1_inpaint())
    hl = model.cfg.latent_size
    d = model.cfg.unet.context_dim
    b = 3 * frames

    @jax.jit
    def init(rng):
        return model.unet.init(
            rng,
            jnp.zeros((1, hl, hl, 9)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 1, d)),
        )["params"]

    params = init(jax.random.PRNGKey(0))

    spec = InjectionSpec(input_blocks=FusionConfig("fft", split_ratio=0.8), chunks=3)
    x9 = jax.random.normal(jax.random.PRNGKey(1), (b, hl, hl, 9), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (b, 1, d), jnp.bfloat16)

    @jax.jit
    def step(p, x, c, t):
        tt = jnp.full((b,), t, jnp.int32)
        eps = model.unet.apply({"params": p}, x, tt, c, injection=spec)
        return x.at[..., :4].add(-0.01 * eps.astype(x.dtype))

    # compile + warmup (forces init completion too)
    x = step(params, x9, ctx, 961)
    _ = float(jax.device_get(jnp.mean(x[..., 0].astype(jnp.float32))))

    n_steps = 20  # chained dependent steps, fetched once
    t0 = time.perf_counter()
    x = x9
    for i in range(n_steps):
        x = step(params, x, ctx, 961 - i * 19)
    _ = float(jax.device_get(jnp.mean(x[..., 0].astype(jnp.float32))))
    dt_step = (time.perf_counter() - t0) / n_steps

    fps = frames / (steps * dt_step)
    print(
        json.dumps(
            {
                "metric": "swap_frames_per_sec_per_chip_512px_50step",
                "value": round(fps, 4),
                "unit": "frames/s",
                "vs_baseline": round(fps / A100_BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
