#!/usr/bin/env python
"""Ablate VAE decode/encode on the real chip: where do the 912 ms/window go?

bench_stages round-2 numbers (6-frame window, 512²): encode 148 ms, decode
321 ms, background trick (encode+decode at frame res) 443 ms — together ~11%
of the window. The decoder's conv FLOPs (~10.5 TFLOP for 6 frames) should
take ~60-110 ms at 50% MXU, so decode runs at ~17% — this script locates the
loss by ablation (same method as bench_unet_ablate).

Variants:
  decode        full decoder, bf16 (the production path)
  dec_no_attn   SelfAttention2D patched to identity — mid-attn cost
  dec_no_gn     GroupNorm32 patched out — fp32 GN cost at 512² activations
  dec_b12       batch 12 (2 windows' result+background decodes batched)
  encode        full encoder
  roundtrip     encode+decode fused in one program (the background trick)

Run: VFACE_PLATFORM= python scripts/bench_vae_ablate.py [--only=a,b]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

F = 6
S = 512
REPS = 5


def const_params(module, *args):
    struct = jax.eval_shape(module.init, jax.random.PRNGKey(0), *args)
    return jax.jit(
        lambda: jax.tree.map(lambda s: jnp.full(s.shape, 1e-3, s.dtype), struct)
    )()


def timeit(fn, *args):
    t0 = time.perf_counter()
    jax.device_get(jax.tree.leaves(fn(*args))[0].ravel()[:8])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        jax.device_get(jax.tree.leaves(fn(*args))[0].ravel()[:8])
    per = (time.perf_counter() - t0) / REPS
    return per, compile_s


def _gn_bf16_apply(self, x, *a, **k):
    """GN with fp32 stats but a bf16 apply pass (numerics probe only)."""
    import jax.numpy as jnp
    import jax as _jax

    c = x.shape[-1]
    g = min(self.num_groups, c)
    cg = c // g
    b = x.shape[0]
    red = tuple(range(1, x.ndim - 1))
    x32 = x.astype(jnp.float32)
    s1 = jnp.sum(x32, axis=red)
    s2 = jnp.sum(x32 * x32, axis=red)
    count = cg
    for ax in red:
        count *= x.shape[ax]
    g1 = jnp.sum(s1.reshape(b, g, cg), -1) / count
    g2 = jnp.sum(s2.reshape(b, g, cg), -1) / count
    inv = _jax.lax.rsqrt(g2 - g1 * g1 + self.epsilon)
    a_c = jnp.broadcast_to(inv[..., None], (b, g, cg)).reshape(b, c)
    m_c = jnp.broadcast_to(g1[..., None], (b, g, cg)).reshape(b, c)
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    return (x - m_c.reshape(shape).astype(x.dtype)) * a_c.reshape(shape).astype(x.dtype)


def main():
    from vface_tpu.models import layers as L
    from vface_tpu.models.vae import AutoencoderKL, VAEConfig

    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")

    print(f"platform: {jax.devices()[0].platform}  F={F} S={S}", flush=True)
    cfg = VAEConfig(dtype=jnp.bfloat16)
    vae = AutoencoderKL(cfg)
    hl = S // 8
    z = jax.random.normal(jax.random.PRNGKey(1), (F, hl, hl, 4), jnp.float32)
    img = jax.random.normal(jax.random.PRNGKey(2), (F, S, S, 3), jnp.float32) * 0.3
    params = const_params(vae, img)

    results = {}

    def run(name, fn, *args, patches=()):
        if only is not None and name not in only:
            return
        saved = {}
        for entry in patches:
            cls_name, patch_fn = (
                entry if isinstance(entry, tuple) else (entry, lambda self, x, *a, **k: x)
            )
            cls = getattr(L, cls_name)
            saved[cls_name] = cls.__call__
            cls.__call__ = patch_fn
        try:
            per, comp = timeit(fn, *args)
            results[name] = round(per * 1e3, 1)
            print(f"{name:12s}  {per*1e3:8.1f} ms   (compile+warm {comp:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL {type(e).__name__}"
            print(f"{name:12s}  FAILED {e}", flush=True)
        finally:
            for cls_name, f_ in saved.items():
                getattr(L, cls_name).__call__ = f_

    dec = jax.jit(lambda p, zz: vae.apply(p, zz, method=vae.decode))
    enc = jax.jit(lambda p, xx: vae.apply(p, xx, method=vae.encode).mode())
    rt = jax.jit(lambda p, xx: vae.apply(p, vae.apply(p, xx, method=vae.encode).mode(),
                                         method=vae.decode))

    run("decode", dec, params, z)
    run("dec_no_attn", jax.jit(lambda p, zz: vae.apply(p, zz, method=vae.decode)),
        params, z, patches=("SelfAttention2D",))
    run("dec_no_gn", jax.jit(lambda p, zz: vae.apply(p, zz, method=vae.decode)),
        params, z, patches=("GroupNorm32",))
    # stats-free per-channel affine: if this matches dec_no_gn, the cost of GN
    # is the two-pass stats dependency; if it matches decode, the cost is the
    # extra elementwise pass / fusion boundary itself
    run("dec_gn_affine", jax.jit(lambda p, zz: vae.apply(p, zz, method=vae.decode)),
        params, z, patches=(("GroupNorm32", lambda self, x, *a, **k: x * 1.001 + 0.001),))
    # fp32 stats but bf16 apply (y computed in bf16): halves the apply-pass
    # register/HBM width if XLA was materialising fp32
    run("dec_gn_bf16apply", jax.jit(lambda p, zz: vae.apply(p, zz, method=vae.decode)),
        params, z, patches=(("GroupNorm32", _gn_bf16_apply),))
    z12 = jnp.concatenate([z, z], axis=0)
    run("dec_b12", dec, params, z12)
    run("encode", enc, params, img)
    run("roundtrip", rt, params, img)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
