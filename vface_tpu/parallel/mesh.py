"""Mesh construction + sharding policy — the framework's collectives backbone.

The reference's only parallelism is PyTorch-Lightning DDP over NCCL for
training (`/root/reference/REFace/main.py:511-526`) and single-GPU inference.
The TPU-native design (SURVEY §2.10, §7):

* a 2-D logical mesh ``(data, model)``; inference shards the frame window
  over ``data`` (frames are the batch dim), training shards the global batch
  over ``data`` with gradient ``psum`` over ICI;
* shardings expressed once as `NamedSharding` policies here so sampler /
  pipeline code stays mesh-agnostic;
* the only cross-frame dependency (FGATS flow warp i−1→i,
  `scripts/temporal_flow.py:223-237`) needs a 1-frame halo — provided by
  :func:`frame_halo_exchange` via ``ppermute`` inside ``shard_map``.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build the (data, model) mesh over all (or given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def single_device_mesh() -> Mesh:
    return make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])


# Canonical partition specs ---------------------------------------------------

BATCH = P("data")  # shard leading (frame/batch) axis
REPLICATED = P()


def shard_batch(mesh: Mesh, tree):
    """Put a pytree of arrays on the mesh with the leading axis on `data`."""
    return jax.device_put(tree, NamedSharding(mesh, BATCH))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, REPLICATED))


def frame_halo_exchange(x: jax.Array, axis_name: str = "data") -> jax.Array:
    """Inside shard_map: fetch the *last* frame of the left neighbor's shard.

    For per-shard frames ``x`` of shape (f_local, ...), returns the frame that
    precedes this shard's first frame (from the neighbouring device), so the
    FGATS blend out[i] = α·x[i] + (1−α)·warp(x[i−1]) can be computed locally
    for every frame including shard boundaries. Device 0's returned halo is
    its own first frame (frame −1 does not exist; blend is identity there).
    """
    n = jax.lax.axis_size(axis_name)
    last = x[-1]
    perm = [(i, (i + 1) % n) for i in range(n)]
    halo = jax.lax.ppermute(last, axis_name, perm)
    idx = jax.lax.axis_index(axis_name)
    return jnp.where(idx == 0, x[0], halo)


def pmean(tree, axis_name: str = "data"):
    return jax.tree_util.tree_map(lambda a: jax.lax.pmean(a, axis_name), tree)


def align_by_flow_sharded(
    x: jax.Array,
    flow: jax.Array,
    alpha: float = 0.8,
    axis_name: str = "data",
    pair_mask: jax.Array = None,
) -> jax.Array:
    """FGATS blend with frames sharded over ``axis_name`` — inside shard_map.

    Per-shard view: x (f_local, H, W, C); flow (f_local, H, W, 2) where
    flow[i] maps local frame i's pixels back to the *previous global frame*
    (the caller shards the global (F, …) flow array with one left-pad so
    flow[0] of shard 0 is unused). The previous frame for local index 0 lives
    on the left neighbour — fetched with one `ppermute` (the 1-frame halo of
    SURVEY §7) instead of an all-gather of the window.

    Thin alias of :func:`vface_tpu.ops.warp.align_by_flow_halo` — the
    primitive the frame-sharded sampling path consumes (via
    ``FusionConfig.flow_axis``); kept here as the parallel-layer API.
    """
    from vface_tpu.ops.warp import align_by_flow_halo

    return align_by_flow_halo(x, flow, alpha, pair_mask, axis_name)


def zero1_sharding(mesh: Mesh, tree, axis_name: str = "data"):
    """ZeRO-1-style sharding pytree for optimizer state: each array leaf is
    sharded along its largest axis divisible by the mesh's ``axis_name`` size,
    replicated otherwise. Gradients stay data-parallel; only the Adam moments
    (the dominant training-memory term — ~2x the trainable params) spread
    across chips. Build with `tree` = the optimizer state and pass the result
    as jit ``out_shardings`` / `jax.device_put` shardings.
    """
    n = mesh.shape[axis_name]

    def leaf_sharding(x):
        shape = getattr(x, "shape", ())
        for i in sorted(range(len(shape)), key=lambda i: -shape[i]):
            if shape[i] % n == 0 and shape[i] >= n:
                spec = [None] * len(shape)
                spec[i] = axis_name
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(leaf_sharding, tree)
