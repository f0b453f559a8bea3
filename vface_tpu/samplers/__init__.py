from vface_tpu.samplers.ddim import ddim_sample, ddim_sample_train, ddim_step
from vface_tpu.samplers.guided import ddim_sample_guided
from vface_tpu.samplers.inversion import ddim_invert
from vface_tpu.samplers.plms import plms_sample
from vface_tpu.samplers.vface import vface_sample

__all__ = [
    "ddim_sample",
    "ddim_sample_train",
    "ddim_step",
    "ddim_sample_guided",
    "ddim_invert",
    "plms_sample",
    "vface_sample",
]
