from minddiffusion_tpu.core.schedules import (
    DiffusionSchedule,
    make_beta_schedule,
    make_ddim_timesteps,
    ddim_sampling_parameters,
    space_timesteps,
    respace_schedule,
)
from minddiffusion_tpu.core import cfg, latents, distributions

__all__ = [
    "DiffusionSchedule",
    "make_beta_schedule",
    "make_ddim_timesteps",
    "ddim_sampling_parameters",
    "space_timesteps",
    "respace_schedule",
    "cfg",
    "latents",
    "distributions",
]
