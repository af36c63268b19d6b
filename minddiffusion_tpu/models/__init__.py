from minddiffusion_tpu.models import attention, clip, glide, layers, lora, srgan, unet, vae

__all__ = ["attention", "clip", "glide", "layers", "lora", "srgan", "unet", "vae"]
