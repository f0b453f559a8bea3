"""Checkpoint / resume — training state and the inference progress manifest.

Capability parity with the reference's persistence (SURVEY §5):

* training: Lightning ``ModelCheckpoint`` save_last/top-k + ``melk()``
  exception save (`/root/reference/REFace/main.py:598-611, 731-756`) →
  Orbax checkpointing of {params, opt_state, step} with a retained-best list;
* inference resume: the reference caches aligned frames/masks/inv-transform
  `.npy` files and per-batch DDIM latents on disk and skips completed videos
  (`scripts/VFace_inference_batch.py:268-309, 529-543, 889-891`) →
  a per-video JSON manifest recording completed windows, making re-runs
  idempotent and preemption-safe (windows are independent, so resume is a
  pure skip-list).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np


# ------------------------------------------------------------------- training


class TrainCheckpointer:
    """Orbax-backed {params, opt_state, step} checkpoints with save_last +
    keep-top-k on a monitored metric (main.py:598-611 semantics)."""

    def __init__(self, directory: str, keep_top_k: int = 30, monitor: str = "loss_simple"):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.keep_top_k = keep_top_k
        self.monitor = monitor
        self._ckpt = ocp.PyTreeCheckpointer()
        self._scores: List[tuple] = []

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save_last(self, state: Dict[str, Any], step: int) -> None:
        self._ckpt.save(self._path("last"), {"state": state, "step": step}, force=True)

    def save_monitored(self, state: Dict[str, Any], step: int, metric: float) -> None:
        name = f"step_{step:08d}"
        self._ckpt.save(self._path(name), {"state": state, "step": step}, force=True)
        self._scores.append((metric, name))
        self._scores.sort()
        while len(self._scores) > self.keep_top_k:
            _, worst = self._scores.pop()
            path = self._path(worst)
            if os.path.exists(path):
                import shutil

                shutil.rmtree(path, ignore_errors=True)

    def restore_last(self) -> Optional[Dict[str, Any]]:
        path = self._path("last")
        if not os.path.exists(path):
            return None
        return self._ckpt.restore(path)


# ------------------------------------------------------------------ inference


class VideoProgressManifest:
    """Per-video JSON manifest: which frame windows are done, where outputs live.

    Windows are independent (no cross-batch temporal state, SURVEY §5), so a
    preempted run resumes by skipping completed windows. Writes are atomic
    (tmp + rename).
    """

    def __init__(self, path: str, meta: Optional[Dict[str, Any]] = None):
        """``meta`` fingerprints the run configuration (window size, steps,
        scale, …). Resuming with a *different* config must not silently stitch
        windows produced under two operating points into one output — on a
        meta mismatch the stale manifest is discarded and the run starts
        fresh (the reference has no such guard; its latent caches are keyed
        by directory only, VFace_inference_batch.py:529-543)."""
        self.path = path
        self.data: Dict[str, Any] = {
            "windows": {},
            "created": time.time(),
            "meta": meta or {},
        }
        if os.path.exists(path):
            with open(path) as f:
                loaded = json.load(f)
            loaded.setdefault("windows", {})
            if meta is not None and loaded.get("meta", {}) != meta:
                print(
                    f"[manifest] {path}: config changed "
                    f"({loaded.get('meta', {})} -> {meta}); discarding stale progress"
                )
            else:
                self.data = loaded

    def is_done(self, window_start: int) -> bool:
        return str(window_start) in self.data.get("windows", {})

    def mark_done(self, window_start: int, n_frames: int, output_paths: List[str]) -> None:
        self.data["windows"][str(window_start)] = {
            "frames": n_frames,
            "outputs": output_paths,
            "ts": time.time(),
        }
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f)
        os.replace(tmp, self.path)

    def completed_frames(self) -> int:
        return sum(w["frames"] for w in self.data.get("windows", {}).values())


def save_params_npz(path: str, params) -> None:
    """Flat-npz param snapshot (portable, no orbax needed for inference)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {}
    for kp, leaf in flat:
        key = "/".join(
            getattr(k, "key", getattr(k, "idx", str(k))) if not isinstance(k, str) else k
            for k in [getattr(p, "key", getattr(p, "idx", p)) for p in kp]
        )
        arrays[key] = np.asarray(leaf)
    np.savez(path, **arrays)


def load_params_npz(path: str, like) -> Any:
    """Restore a flat-npz snapshot into the structure of ``like``."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for kp, leaf in flat:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in kp
        )
        leaves.append(np.asarray(data[key]).reshape(np.shape(leaf)))
    return jax.tree_util.tree_unflatten(treedef, leaves)
