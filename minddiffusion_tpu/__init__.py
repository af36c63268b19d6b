"""minddiffusion_tpu — a TPU-native (JAX/XLA/Pallas) text-to-image diffusion framework.

Re-implements, from scratch and TPU-first, the capabilities of
mindspore-lab/minddiffusion (reference mounted at /root/reference):

* Stable Diffusion 2.0 (English CLIP-H, 512x512 latent diffusion): txt2img,
  img2img, inpainting, finetune training.
* Wukong-Huahua (Chinese wordpiece-CLIP SD 1.x): txt2img, inpainting,
  DreamBooth, LoRA.
* Taichu-GLIDE (Chinese GLIDE cascade): 64px base -> 256px diffusion
  super-resolution -> 1024px SRGAN, plus base/super-res finetuning.

Design principles (see DESIGN.md):
  - Every denoising run is ONE jitted XLA program (`lax.scan` over the step
    schedule), not a host loop of per-step graph launches.
  - NHWC layout, bf16 compute with fp32 norm/softmax statistics.
  - Classifier-free guidance is folded onto the batch axis inside jit.
  - Distribution via `jax.sharding.Mesh` (dp, fsdp, tp) + NamedSharding;
    collectives are inserted by XLA, never hand-rolled rank plumbing.
  - The spatial-attention hot path runs custom Pallas kernels in the model's
    native heads-packed layout (ops/flash_attention.py).

Package map: core/ (schedules, CFG, latents) · samplers/ · models/ · ops/ ·
pipelines/ · text/ · train/ · parallel/ · data/ · io/ · cli/ · serving/ ·
utils/.
"""

__version__ = "0.2.0"
