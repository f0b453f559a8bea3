#!/usr/bin/env python
"""Attribute the super-pack program's wall time by stubbing stage groups.

The headline bench is ONE jitted program (`_superpack_impl`); per-stage cost
inside it cannot be fenced, so this script compiles ablated variants with a
stage group replaced by a cheap shape-preserving stub (dependencies kept so
XLA cannot dead-code unrelated stages) and reports the delta vs full:

  full        the production program (the bench operating point)
  stub_unet   ddim_invert + vface_sample replaced by identity-ish passes
              → everything EXCEPT the 150 UNet evals
  stub_vae    encode/decode/background replaced by resize-ish stubs
              → isolates the VAE stages (incl. background trick)
  stub_glue   paste_back replaced by a flat blend
              → isolates the final warp/composite

Each variant costs one remote super-pack compile (~3-15 min first time,
persistently cached). Run: VFACE_PLATFORM= python scripts/bench_superpack_ablate.py [--only=a,b]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

REPS = 2


def main():
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = a.split("=", 1)[1].split(",")

    import vface_tpu.pipelines.video_swap as VS
    from vface_tpu.models import ModelConfig, VFaceModel
    from vface_tpu.pipelines.video_swap import SwapOptions, VideoSwapPipeline

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    model = VFaceModel(ModelConfig.sd_v1_inpaint())
    params = jax.jit(model.init)(jax.random.PRNGKey(0))

    opts = SwapOptions(batch_windows=2, invert_packs=2)
    w = opts.window * opts.batch_windows
    f = 2 * w
    s = opts.image_size
    d = model.cfg.unet.context_dim

    frames01 = jax.random.uniform(jax.random.PRNGKey(8), (f, s, s, 3))
    crops01 = jax.random.uniform(jax.random.PRNGKey(1), (f, s, s, 3))
    keep = jnp.ones((f, s, s, 1))
    cond = jax.random.normal(jax.random.PRNGKey(2), (f, 1, d))
    uncond = jax.random.normal(jax.random.PRNGKey(3), (f, 1, d))
    inv_c = jax.random.normal(jax.random.PRNGKey(4), (f, 1, d))
    ident = np.tile(np.asarray([1, 0, 0, 0, 1, 0, 0, 0], np.float32), (f, 1))
    inv_coeffs = jnp.asarray(ident)
    m = np.ones((w - 1,), np.float32)
    for b0 in range(opts.window, w, opts.window):
        m[b0 - 1] = 0.0
    pm = jnp.asarray(m)
    hq = model.cfg.latent_size
    flow = jax.random.normal(jax.random.PRNGKey(5), (f - 1, s, s, 2))

    # ---- stubs (shape-preserving, dependency-keeping) ----
    real_invert = VS.ddim_invert
    real_sample = VS.vface_sample
    real_paste = VS.paste_back
    real_enc = VFaceModel.encode_first_stage
    real_dec = VFaceModel.decode_first_stage

    def stub_invert(model_, params_, z, c, zi, ml, **kw):
        return z * 0.999 + 0.001 * jnp.mean(c), None

    def stub_sample(model_, params_, x_T, cond_, uncond_, tarc, inv, zi, ml,
                    inj, **kw):
        return x_T * 0.999 + 0.001 * (jnp.mean(cond_) + jnp.mean(uncond_)), None

    def stub_encode(self, params_, x):
        # strided-slice downsample to latent grid, 3->4ch via pad
        z = x[:, ::8, ::8, :]
        return jnp.concatenate([z, z[..., :1]], axis=-1) * 0.18215

    def stub_decode(self, params_, z):
        up = jnp.repeat(jnp.repeat(z[..., :3], 8, axis=1), 8, axis=2)
        return up * 0.999

    def stub_paste(bg, out01, coeffs, mask):
        return 0.9 * bg + 0.1 * (out01 + 1e-6 * jnp.mean(coeffs) + 0 * mask)

    variants = {
        "full": {},
        "stub_unet": {"ddim_invert": stub_invert, "vface_sample": stub_sample},
        "stub_vae": {"encode": stub_encode, "decode": stub_decode},
        "stub_glue": {"paste_back": stub_paste},
    }

    results = {}
    for name, patch in variants.items():
        if only is not None and name not in only:
            continue
        VS.ddim_invert = patch.get("ddim_invert", real_invert)
        VS.vface_sample = patch.get("vface_sample", real_sample)
        VS.paste_back = patch.get("paste_back", real_paste)
        VFaceModel.encode_first_stage = patch.get("encode", real_enc)
        VFaceModel.decode_first_stage = patch.get("decode", real_dec)
        try:
            pipe = VideoSwapPipeline(model, opts)

            def run():
                out = pipe._superpack_jit(
                    params, frames01, inv_coeffs, crops01 * 2 - 1, keep,
                    cond, uncond, inv_c, flow, pm, pm, has_flow=True,
                )
                return float(jax.device_get(jnp.mean(out)))

            t0 = time.perf_counter()
            run()
            comp = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(REPS):
                run()
            per = (time.perf_counter() - t0) / REPS
            results[name] = round(per, 3)
            print(f"{name:10s}  {per:7.3f} s   (compile+warm {comp:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            results[name] = f"FAIL {type(e).__name__}"
            print(f"{name:10s}  FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
        finally:
            VS.ddim_invert = real_invert
            VS.vface_sample = real_sample
            VS.paste_back = real_paste
            VFaceModel.encode_first_stage = real_enc
            VFaceModel.decode_first_stage = real_dec
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
