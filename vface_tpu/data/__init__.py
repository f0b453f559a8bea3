from vface_tpu.data.datasets import (
    CelebATrainDataset,
    VideoFramesDataset,
    normalize_img,
    test_bench_pairs,
)

__all__ = [
    "CelebATrainDataset",
    "VideoFramesDataset",
    "normalize_img",
    "test_bench_pairs",
]
