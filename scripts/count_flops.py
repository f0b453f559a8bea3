#!/usr/bin/env python
"""XLA cost-analysis FLOP counts for the hot programs (CPU backend).

Pairs with scripts/bench_unet_ablate.py / bench_vae_ablate.py on-chip timings
to compute achieved TFLOP/s per section and find where the v5e headroom is
(peak 197 bf16 TFLOP/s; the dh=40 attention QK^T/AV ceiling is 40/128 = 31%).

Run: JAX_PLATFORMS=cpu python scripts/count_flops.py [--b 2] [--hl 64]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def flops_of(fn, *args) -> float:
    comp = jax.jit(fn).lower(*args).compile()
    ca = comp.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return float(ca.get("flops", 0.0))


def zeros_like_tree(struct):
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), struct)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--hl", type=int, default=64)
    ap.add_argument("--scale_to", type=int, default=24, help="report TFLOP at this batch")
    args = ap.parse_args()
    B, HL = args.b, args.hl
    k = args.scale_to / B

    from vface_tpu.models.unet import UNetConfig, UNetModel

    base = UNetConfig.sd_v1_inpaint()
    variants = {
        "unet_full": base,
        "unet_no_attn": dataclasses.replace(base, attention_resolutions=()),
        "unet_no_ds1attn": dataclasses.replace(base, attention_resolutions=(2, 4)),
    }
    x = jnp.zeros((B, HL, HL, 9))
    t = jnp.zeros((B,), jnp.int32)
    c = jnp.zeros((B, 1, base.context_dim))
    for name, cfg in variants.items():
        unet = UNetModel(cfg)
        params = zeros_like_tree(jax.eval_shape(unet.init, jax.random.PRNGKey(0), x, t, c))
        f = flops_of(lambda p, x, t, c: unet.apply(p, x, t, c), params, x, t, c)
        print(f"{name:18s} {f / B / 1e12:8.4f} TFLOP/sample   {f * k / 1e12:8.3f} TFLOP @B={args.scale_to}", flush=True)

    from vface_tpu.models.vae import VAEConfig, AutoencoderKL

    vcfg = VAEConfig()
    vae = AutoencoderKL(vcfg)
    F, S = 2, HL * 8
    img = jnp.zeros((F, S, S, 3))
    z = jnp.zeros((F, HL, HL, 4))
    vparams = zeros_like_tree(jax.eval_shape(vae.init, jax.random.PRNGKey(0), img))
    fd = flops_of(lambda p, z: vae.apply(p, z, method=vae.decode), vparams, z)
    fe = flops_of(lambda p, i: vae.apply(p, i, method=vae.encode).mean, vparams, img)
    print(f"vae_decode         {fd / F / 1e12:8.4f} TFLOP/frame    {fd / F * 6 / 1e12:8.3f} TFLOP @6f", flush=True)
    print(f"vae_encode         {fe / F / 1e12:8.4f} TFLOP/frame    {fe / F * 6 / 1e12:8.3f} TFLOP @6f", flush=True)


if __name__ == "__main__":
    main()
