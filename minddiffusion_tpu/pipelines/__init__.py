from minddiffusion_tpu.pipelines.glide_cascade import GlideCascadePipeline, GlideModels
from minddiffusion_tpu.pipelines.stable_diffusion import (
    SDModels,
    StableDiffusionPipeline,
    create_sd_models,
)

__all__ = [
    "SDModels",
    "StableDiffusionPipeline",
    "create_sd_models",
    "GlideModels",
    "GlideCascadePipeline",
]
