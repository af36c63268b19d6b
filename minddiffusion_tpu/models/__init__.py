from minddiffusion_tpu.models import layers, attention, unet, vae, clip

__all__ = ["layers", "attention", "unet", "vae", "clip"]
