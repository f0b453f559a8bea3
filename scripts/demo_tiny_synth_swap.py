#!/usr/bin/env python
"""End-to-end swap demo with the TRAINED tiny synthetic bundle.

No real checkpoints exist in this environment, so every prior end-to-end
run used random weights (outputs = structured noise). With the round-4
tiny bundle (scripts/train_synthetic_tiny.py) the full pipeline — align →
parse → invert → hooked FSAI/FGATS sampling → decode → paste-back —
produces face-like imagery for the first time in-env. This writes
docs/tiny_synth_swap.png: rows = source face / target frames / swapped
output.

Run: VFACE_PLATFORM= python scripts/demo_tiny_synth_swap.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vface_tpu.utils.platform import apply_platform_from_env  # noqa: E402

apply_platform_from_env()


def main():
    import jax
    import jax.numpy as jnp

    from vface_tpu.models import ModelConfig, VFaceModel
    from vface_tpu.models.raft import RAFT, RAFTConfig
    from vface_tpu.pipelines.video_swap import SwapOptions, VideoSwapPipeline
    from vface_tpu.preprocess.synthetic_faces import render_face, render_pan_sequence
    from vface_tpu.runtime.checkpoint import load_params_npz

    size = 64
    model = VFaceModel(ModelConfig.tiny(image_size=size))
    params = jax.jit(model.init)(jax.random.PRNGKey(0))
    wpath = os.path.join(os.path.dirname(__file__), "..",
                         "vface_tpu", "weights", "tiny_synth.npz")
    if not os.path.exists(wpath):
        raise SystemExit("run scripts/train_synthetic_tiny.py first (tiny_synth.npz)")
    params = load_params_npz(wpath, params)

    hl = model.cfg.latent_size
    opts = SwapOptions(
        ddim_steps=12, inversion_steps=12, window=4, image_size=size,
        parser_size=64, flow_tokens=hl * hl,
    )
    pipe = VideoSwapPipeline(model, opts)
    pipe.raft = RAFT(RAFTConfig(iters=2))
    rng = jax.random.PRNGKey(1)
    aux = {
        "bisenet": pipe.bisenet.init(rng, jnp.zeros((1, 64, 64, 3)))["params"],
        "raft": pipe.raft.init(
            rng, jnp.zeros((1, size, size, 3)), jnp.zeros((1, size, size, 3))
        )["params"],
        "landmark": pipe.landmark_net.init(rng, jnp.zeros((1, size, size, 3)))["params"],
    }

    frames, lms = render_pan_sequence(np.random.default_rng(11), 8, 64, step_px=1.5)
    source, src_lm = render_face(np.random.default_rng(12), 64)

    # ground-truth geometry from the renderer: landmarks drive the align
    # quads, landmark-hull keep masks ride the precomputed-mask mode (the
    # parser/landmark nets have no trained tiny weights in this bundle)
    sys.path.insert(0, os.path.dirname(__file__))
    from train_synthetic_tiny import face_hull_mask

    # crops are near-identity at 64² (frames are already face-centered);
    # hull masks computed in frame space serve as crop-space masks
    frame_keep = np.stack([face_hull_mask(l, 64)[..., None] for l in lms])
    src_keep = face_hull_mask(src_lm, 64)[..., None]
    out = np.asarray(pipe.swap_video_frames(
        params, aux, frames, source,
        frame_landmarks=jnp.asarray(lms), frame_keep=frame_keep,
        source_keep=src_keep,
    ))

    from PIL import Image

    n = frames.shape[0]
    cell = 64
    canvas = Image.new("RGB", (n * (cell + 2) + 2, 3 * (cell + 2) + 2), "black")
    src_im = Image.fromarray((source * 255).astype(np.uint8))
    for i in range(n):
        canvas.paste(src_im, (i * (cell + 2) + 2, 2))
        canvas.paste(
            Image.fromarray((frames[i] * 255).astype(np.uint8)),
            (i * (cell + 2) + 2, cell + 4),
        )
        canvas.paste(
            Image.fromarray((np.clip(out[i], 0, 1) * 255).astype(np.uint8)),
            (i * (cell + 2) + 2, 2 * cell + 6),
        )
    dst = os.path.join(os.path.dirname(__file__), "..", "docs", "tiny_synth_swap.png")
    canvas = canvas.resize((canvas.width * 3, canvas.height * 3), Image.NEAREST)
    canvas.save(dst)
    print(f"wrote {dst}  (rows: source / target frames / swapped)")
    # quick sanity: output should be finite and not collapse to a constant
    assert np.isfinite(out).all()
    print(f"output std {out.std():.3f} (input std {frames.std():.3f})")


if __name__ == "__main__":
    main()
