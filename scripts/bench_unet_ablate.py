#!/usr/bin/env python
"""Ablate the flagship UNet forward on the real chip: where does the step go?

The 2-chunk sampling step is 106 ms (b=12) / the bench runs b=24 packs; the
per-eval MXU utilisation works out to ~20% of v5e peak, so there is headroom
somewhere.  jax.profiler is not supported by the tunneled PJRT plugin, so this
script locates the time by *ablation*: each variant runs a 10-iteration
`lax.scan` over a raw 2-chunk UNet forward (b=24, 64x64 latents, 1-token
context — the bench.py operating point at batch_windows=2) and reports
ms / forward eval.

Variants:
  full       default sd_v1_inpaint config (dpa + flash gates, remat on)
  no_remat   use_remat=False — is jax.checkpoint hurting inference fusion?
  einsum     use_flash=False — plain einsum attention everywhere
  no_attn    attention_resolutions=() — convs/GN/emb only (no transformers)
  no_gn      GroupNorm32 patched to identity (isolates GN cost)
  no_norm    GroupNorm32 + LayerNormF32 patched out (norm-free)

Params are filled with a constant via eval_shape (timing does not depend on
values; avoids one remote init compile per variant).

Run: VFACE_PLATFORM= python scripts/bench_unet_ablate.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

B = 24          # 2 windows x 6 frames x 2 chunks
HL = 64         # 512px latents
N_ITER = 10
REPS = 3


def const_params(module, *args):
    struct = jax.eval_shape(module.init, jax.random.PRNGKey(0), *args)
    return jax.jit(
        lambda: jax.tree.map(lambda s: jnp.full(s.shape, 1e-3, s.dtype), struct)
    )()


def time_variant(name, cfg, patches=()):
    from vface_tpu.models import layers as L
    from vface_tpu.models import unet as U
    from vface_tpu.models.unet import UNetModel

    saved = {}
    for cls_name, attr in patches:
        cls = getattr(L, cls_name, None) or getattr(U, cls_name)
        saved[cls] = cls.__call__
        cls.__call__ = lambda self, x, *a, **k: x
    try:
        unet = UNetModel(cfg)
        x9 = jax.random.normal(jax.random.PRNGKey(1), (B, HL, HL, 9))
        ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 1, cfg.context_dim))
        t_vec = jnp.full((B,), 500, jnp.int32)
        params = const_params(unet, x9, t_vec, ctx)

        def step(p, carry, _):
            x, acc = carry
            out = unet.apply(p, x, t_vec, ctx)
            x = x.at[..., :4].add(0.001 * out.astype(x.dtype))
            return (x, acc + jnp.mean(out)), None

        @jax.jit
        def run(p, x):
            (_, acc), _ = lax.scan(
                lambda c, _: step(p, c, _), (x, jnp.float32(0.0)), None, length=N_ITER
            )
            return acc

        t0 = time.perf_counter()
        float(jax.device_get(run(params, x9)))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(REPS):
            float(jax.device_get(run(params, x9)))
        per_eval = (time.perf_counter() - t0) / REPS / N_ITER
        print(
            f"{name:10s}  {per_eval*1e3:8.2f} ms/eval   (compile+warm {compile_s:.1f}s)",
            flush=True,
        )
        return per_eval
    finally:
        for cls, fn in saved.items():
            cls.__call__ = fn


def main():
    import dataclasses

    from vface_tpu.models.unet import UNetConfig

    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")

    print(f"platform: {jax.devices()[0].platform}  B={B} HL={HL}", flush=True)
    base = UNetConfig.sd_v1_inpaint()

    variants = {
        "full": (base, ()),
        "no_attn": (dataclasses.replace(base, attention_resolutions=()), ()),
        "no_ds1attn": (dataclasses.replace(base, attention_resolutions=(2, 4)), ()),
        "no_ff": (base, (("FeedForward", None),)),
        "no_gn": (base, (("GroupNorm32", None),)),
        "no_remat": (dataclasses.replace(base, use_remat=False), ()),
        "einsum": (dataclasses.replace(base, use_flash=False), ()),
        "no_norm": (base, (("GroupNorm32", None), ("LayerNormF32", None))),
    }
    results = {}
    for name, (cfg, patches) in variants.items():
        if only is not None and name not in only:
            continue
        results[name] = time_variant(name, cfg, patches=patches)
    print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
