from vface_tpu.utils.config import build, instantiate_from_config, load_yaml, register
from vface_tpu.utils.ema import EmaState, ema_init, ema_update
from vface_tpu.utils.logging import MetricsLogger
from vface_tpu.utils.profiling import StageTimer, device_memory_stats, trace
from vface_tpu.utils.schedule import (
    DDIMSchedule,
    DiffusionSchedule,
    make_beta_schedule,
    make_ddim_timesteps,
    timestep_embedding,
)

__all__ = [
    "build",
    "instantiate_from_config",
    "load_yaml",
    "register",
    "EmaState",
    "ema_init",
    "ema_update",
    "MetricsLogger",
    "StageTimer",
    "device_memory_stats",
    "trace",
    "DDIMSchedule",
    "DiffusionSchedule",
    "make_beta_schedule",
    "make_ddim_timesteps",
    "timestep_embedding",
]
