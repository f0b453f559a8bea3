from vface_tpu.pipelines.image_swap import ImageSwapOptions, run_test_bench, swap_image_batch
from vface_tpu.pipelines.train import TrainConfig, make_optimizer, make_train_step, p_losses_face
from vface_tpu.pipelines.video_swap import SwapOptions, VideoSwapPipeline

__all__ = [
    "ImageSwapOptions",
    "run_test_bench",
    "swap_image_batch",
    "TrainConfig",
    "make_optimizer",
    "make_train_step",
    "p_losses_face",
    "SwapOptions",
    "VideoSwapPipeline",
]
