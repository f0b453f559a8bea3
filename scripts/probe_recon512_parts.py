#!/usr/bin/env python
"""Pin down WHICH part of the 512² recon2+ID backward crashes the remote
TPU compiler (follow-up to scripts/unblock_recon512.py: the fused step AND
the coarse eps/recon split both die in tpu_compile_helper; one attempt was
SIGKILLed → the server-side compiler runs out of memory).

Three minimal grad programs at 512² bs1, each one stage of the recon loss:

  P1 chain-only   — grads of sum(intermediates) through the 2-step DDIM
                    recon chain (2 UNet fwd+bwd, no decode/ID).
  P2 decode-only  — grads of sum(decode(z)) through ONE 512² VAE decode.
  P3 decode+ID    — P2 plus the masked ArcFace ID loss (decode + IRSE50
                    fwd+bwd) for one intermediate.

Whichever fails isolates the compiler-killing subgraph; whatever passes
defines the finest viable program split (manual VJP composition across
programs — chain fwd, per-intermediate decode+ID cotangents, chain bwd).

Run: VFACE_PLATFORM= python scripts/probe_recon512_parts.py
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


def attempt(name, fn, *args):
    try:
        t0 = time.perf_counter()
        out = fn(*args)
        v = float(jax.device_get(out if out.ndim == 0 else jnp.sum(out)))
        dt = time.perf_counter() - t0
        print(f"{name}: OK ({dt:.0f}s compile+run, value {v:.4f})", flush=True)
        return {"ok": True, "compile_s": round(dt, 1)}
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name}: FAIL ({msg})", flush=True)
        return {"ok": False, "error": msg}


def main():
    from vface_tpu.models import ModelConfig, VFaceModel
    from vface_tpu.models.arcface import IRSE50, arcface_preprocess, safe_l2_normalize
    from vface_tpu.samplers.ddim import ddim_sample_train

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    model = VFaceModel(ModelConfig.sd_v1_inpaint())
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    hl = model.cfg.latent_size
    b = 1
    z_hi = jax.random.normal(jax.random.PRNGKey(1), (b, hl, hl, 4))
    z_inp = jax.random.normal(jax.random.PRNGKey(2), (b, hl, hl, 4))
    maskl = jnp.ones((b, hl, hl, 1))
    cond = jax.random.normal(jax.random.PRNGKey(3), (b, 1, 768))
    t_max = model.schedule.num_timesteps - 1
    results = {}

    # P1: chain-only backward (2 UNet fwd+bwd, unrolled)
    def chain_loss(p):
        z_rec, inters = ddim_sample_train(model, p, z_hi, t_max, 2, cond, z_inp, maskl)
        return jnp.sum(jnp.abs(inters)) / inters.size

    g1 = jax.jit(lambda p: jax.grad(chain_loss)(p)["unet"]["out_conv"]["bias"])
    results["P1_chain_only"] = attempt("P1_chain_only", g1, params)

    # P2: one 512² VAE decode backward
    def dec_loss(p, z):
        return jnp.mean(jnp.abs(model.decode_first_stage(p, z)))

    g2 = jax.jit(lambda p, z: jax.grad(dec_loss, argnums=1)(p, z))
    results["P2_decode_only"] = attempt("P2_decode_only", g2, params, z_hi)

    # P3: decode + masked ArcFace ID for one intermediate
    arc = IRSE50(stages=model.cfg.cond.arcface_stages)

    def dec_id_loss(p, z):
        img = model.decode_first_stage(p, z)
        masked01 = (img + 1.0) * 0.5
        f = arc.apply({"params": p["cond"]["arcface"]}, arcface_preprocess(masked01))
        f = safe_l2_normalize(f)
        ref = safe_l2_normalize(jnp.ones_like(f))
        return jnp.mean(1.0 - jnp.sum(f * ref, axis=-1)) + 0.0 * jnp.mean(img)

    g3 = jax.jit(lambda p, z: jax.grad(dec_id_loss, argnums=1)(p, z))
    results["P3_decode_id"] = attempt("P3_decode_id", g3, params, z_hi)

    # P4: chain + THREE decode+ID terms but NO eps part — the exact recon
    # half at half precision of attribution: if P1..P3 all pass but this
    # fails, the crash is a SIZE effect (sum of parts), not one subgraph
    def recon_half(p):
        z_rec, inters = ddim_sample_train(model, p, z_hi, t_max, 2, cond, z_inp, maskl)
        k = inters.shape[0]
        loss = 0.0
        for j in range(k):
            loss = loss + dec_id_loss(p, inters[j])
        return loss / k

    g4 = jax.jit(lambda p: jax.grad(recon_half)(p)["unet"]["out_conv"]["bias"])
    results["P4_recon_half"] = attempt("P4_recon_half", g4, params)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
