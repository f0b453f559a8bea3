from vface_tpu.preprocess.align import (
    compute_quad,
    paste_back,
    perspective_coefficients,
    perspective_warp,
    quad_crop,
)
from vface_tpu.preprocess.landmarks import LandmarkNet, UNetLandmarkHead, landmarks_to_vector
from vface_tpu.preprocess.masks import (
    FFHQ12_PRESERVE,
    TRAIN_REMOVE,
    celeba_to_seg12,
    downsample_mask_to_latent,
    inpaint_inputs,
    preserve_mask_seg12,
    region_mask,
)
from vface_tpu.preprocess.tps import tps_coefficients, tps_transform, tps_warp

__all__ = [
    "compute_quad",
    "paste_back",
    "perspective_coefficients",
    "perspective_warp",
    "quad_crop",
    "LandmarkNet",
    "UNetLandmarkHead",
    "landmarks_to_vector",
    "FFHQ12_PRESERVE",
    "TRAIN_REMOVE",
    "celeba_to_seg12",
    "downsample_mask_to_latent",
    "inpaint_inputs",
    "preserve_mask_seg12",
    "region_mask",
    "tps_coefficients",
    "tps_transform",
    "tps_warp",
]
