from vface_tpu.runtime.checkpoint import (
    TrainCheckpointer,
    VideoProgressManifest,
    load_params_npz,
    save_params_npz,
)

__all__ = [
    "TrainCheckpointer",
    "VideoProgressManifest",
    "load_params_npz",
    "save_params_npz",
]
