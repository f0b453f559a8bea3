#!/usr/bin/env python
"""Batch-scaling of the flagship UNet eval on the real chip.

Motivates (and later validates) the pipelined pack design: if the per-eval
cost is t(b) = c0 + c1*b with a sizable c0, then folding pack i+1's
inversion sub-batch (b=F, hooks off) into pack i's sampling eval (b=2F)
as one b=3F eval saves ~c0 per step over running them as separate programs
(50 sampling + 50 inversion evals per pack otherwise).

Times a 10-iteration `lax.scan` over the raw UNet forward per batch size
(64x64 latents, 1-token context — the bench.py operating point), reporting
ms/eval and the implied ms/frame at the sampling(2F)+inversion(F) split.

Run: VFACE_PLATFORM= python scripts/bench_batch_scaling.py [--b 12,24,36,48,72]
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

HL = 64
N_ITER = 10
REPS = 3


def main():
    batches = [12, 24, 36, 48, 72]
    for a in sys.argv[1:]:
        if a.startswith("--b"):
            batches = [int(x) for x in a.split("=", 1)[1].split(",")]

    from vface_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig.sd_v1_inpaint()
    unet = UNetModel(cfg)
    print(f"platform: {jax.devices()[0].platform}  HL={HL}", flush=True)

    results = {}
    for b in batches:
        x9 = jax.random.normal(jax.random.PRNGKey(1), (b, HL, HL, 9))
        ctx = jax.random.normal(jax.random.PRNGKey(2), (b, 1, cfg.context_dim))
        t_vec = jnp.full((b,), 500, jnp.int32)
        struct = jax.eval_shape(unet.init, jax.random.PRNGKey(0), x9, t_vec, ctx)
        params = jax.jit(
            lambda: jax.tree.map(lambda s: jnp.full(s.shape, 1e-3, s.dtype), struct)
        )()

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
        results[b] = per_eval
        print(
            f"b={b:3d}  {per_eval*1e3:8.2f} ms/eval  {per_eval/b*1e3:6.2f} ms/frame-row"
            f"   (compile+warm {compile_s:.1f}s)",
            flush=True,
        )

    print(json.dumps({str(k): round(v * 1e3, 2) for k, v in results.items()}))
    # implied per-pack savings of the combined b=3F eval vs 2F + F separately
    for f in (12, 24):
        t2, t1, t3 = results.get(2 * f), results.get(f), results.get(3 * f)
        if t2 and t1 and t3:
            print(
                f"F={f}: separate {1e3*(t2+t1):.1f} ms/step, combined {1e3*t3:.1f}"
                f" — save {1e3*(t2+t1-t3):.1f} ms/step ({50*(t2+t1-t3):.2f} s/pack)"
            )


if __name__ == "__main__":
    main()
