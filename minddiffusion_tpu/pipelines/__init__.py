from minddiffusion_tpu.pipelines.stable_diffusion import (
    SDModels,
    StableDiffusionPipeline,
)

__all__ = ["SDModels", "StableDiffusionPipeline"]
