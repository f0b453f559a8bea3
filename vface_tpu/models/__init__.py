from vface_tpu.models.arcface import IRSE50, arcface_preprocess, id_embedding, id_loss
from vface_tpu.models.clip import CLIPConditioner, CLIPVisionConfig, clip_preprocess
from vface_tpu.models.conditioning import Conditioner, ConditionerConfig
from vface_tpu.models.ldm import ModelConfig, VFaceModel
from vface_tpu.models.unet import InjectionSpec, UNetConfig, UNetModel
from vface_tpu.models.vae import SD_SCALE_FACTOR, AutoencoderKL, VAEConfig

__all__ = [
    "IRSE50",
    "arcface_preprocess",
    "id_embedding",
    "id_loss",
    "CLIPConditioner",
    "CLIPVisionConfig",
    "clip_preprocess",
    "Conditioner",
    "ConditionerConfig",
    "ModelConfig",
    "VFaceModel",
    "InjectionSpec",
    "UNetConfig",
    "UNetModel",
    "SD_SCALE_FACTOR",
    "AutoencoderKL",
    "VAEConfig",
]
