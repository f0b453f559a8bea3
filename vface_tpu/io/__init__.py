from vface_tpu.io.video import (
    iter_y4m_prefetched,
    native_available,
    read_y4m,
    write_avi,
    write_gif,
    write_y4m,
)

__all__ = [
    "iter_y4m_prefetched",
    "native_available",
    "read_y4m",
    "write_avi",
    "write_gif",
    "write_y4m",
]
