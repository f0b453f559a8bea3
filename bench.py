"""Benchmark: swapped frames/sec/chip at 512px, 50-step DDIM (BASELINE.md north star).

Runs the flagship denoiser hot path on the real chip: the 3-chunk VFace
sampling step (full SD-v1-4 9ch UNet, bf16, FSAI injection at input-block
attn1) scanned for the full 50 steps — the dominant cost of the reference
pipeline (`scripts/VFace_inference_batch.py:580-594`, 50 × 3-chunk UNet
forwards per 6-frame window).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: an A100 diffusers SD-1.5 fp16 baseline runs ~23 it/s at 512²
batch 1 (2-chunk CFG ⇒ ~46 UNet-forward-equivalents/s ⇒ a 6-frame VFace
window at 3 chunks = 18 forward-equiv/frame-step... normalised here to
frames/sec at the reference operating point: 50 steps × 3-chunk ≈
0.30 frames/s/GPU measured for the torch reference path). We report
frames/sec/chip and the ratio to that 0.30 f/s A100 figure.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

A100_BASELINE_FPS = 0.30  # reference torch pipeline, frames/s on A100 (see module docstring)


def main():
    from vface_tpu.models import InjectionSpec, ModelConfig, VFaceModel
    from vface_tpu.ops.attention import FusionConfig

    frames = 6  # the reference window (VFace_inference_batch.py:783-787)
    steps = 50
    model = VFaceModel(ModelConfig.sd_v1_inpaint())
    hl = model.cfg.latent_size
    d = model.cfg.unet.context_dim
    rng = jax.random.PRNGKey(0)
    unet_params = model.unet.init(
        rng,
        jnp.zeros((1, hl, hl, 9)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 1, d)),
    )["params"]

    spec = InjectionSpec(input_blocks=FusionConfig("fft", split_ratio=0.8), chunks=3)
    b = 3 * frames
    x9 = jax.random.normal(jax.random.PRNGKey(1), (b, hl, hl, 9), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (b, 1, d), jnp.bfloat16)

    @jax.jit
    def run(params, x9, ctx):
        def body(x, t):
            tt = jnp.full((b,), t, jnp.int32)
            eps = model.unet.apply({"params": params}, x[..., :9], tt, ctx, injection=spec)
            # fold eps back in so steps are serialized like real sampling
            return x.at[..., :4].add(-0.01 * eps.astype(x.dtype)), ()

        ts = jnp.linspace(961, 1, steps).astype(jnp.int32)
        x_final, _ = jax.lax.scan(body, x9, ts)
        # scalar reduce: the timing fetches this, forcing the whole scan
        return jnp.mean(x_final.astype(jnp.float32))

    # compile + warmup. NOTE: on the tunneled-TPU ("axon") backend
    # block_until_ready() is a no-op — only a host transfer actually waits —
    # so we time via device_get of the scalar result.
    float(jax.device_get(run(unet_params, x9, ctx)))
    t0 = time.perf_counter()
    n_rep = 3
    for _ in range(n_rep):
        out = float(jax.device_get(run(unet_params, x9, ctx)))
    dt = (time.perf_counter() - t0) / n_rep

    fps = frames / dt  # frames per second per chip at the 50-step operating point
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
