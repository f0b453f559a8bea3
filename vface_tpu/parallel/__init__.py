from vface_tpu.parallel.mesh import (
    BATCH,
    REPLICATED,
    frame_halo_exchange,
    make_mesh,
    pmean,
    replicate,
    shard_batch,
    single_device_mesh,
)

__all__ = [
    "BATCH",
    "REPLICATED",
    "frame_halo_exchange",
    "make_mesh",
    "pmean",
    "replicate",
    "shard_batch",
    "single_device_mesh",
]
