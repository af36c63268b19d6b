"""Shared CLI plumbing: model building, weight loading, image saving."""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

# Restore the JAX_PLATFORMS=cpu escape hatch for CLI subprocesses: the
# container's sitecustomize force-registers the axon TPU platform and sets
# jax_platforms="axon,cpu" regardless of the environment, so a user-supplied
# JAX_PLATFORMS=cpu is silently ignored and the CLI blocks on a chip claim.
# Only the exact "cpu" request is honored (the ambient default is "axon";
# re-asserting that here would clobber in-process config.update calls, e.g.
# the test conftest's CPU flip).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def build_sd(family: str, dtype_str: str = "bf16", tiny: bool = False,
             enable_lora: bool = False):
    import jax.numpy as jnp

    from minddiffusion_tpu.pipelines.stable_diffusion import SDModels

    dtype = {"bf16": jnp.bfloat16, "fp32": jnp.float32}[dtype_str]
    if tiny:
        # --debug_tiny: structurally-complete miniature for CLI smoke tests
        from minddiffusion_tpu.models.clip import CLIPTextConfig
        from minddiffusion_tpu.models.unet import UNetConfig
        from minddiffusion_tpu.models.vae import VAEConfig

        in_ch = 9 if family == "wukong-inpaint" else 4
        return SDModels.create(
            family=family, dtype=dtype, enable_lora=enable_lora,
            unet_config=UNetConfig(
                in_channels=in_ch, model_channels=32, out_channels=4,
                num_res_blocks=1, attention_resolutions=(2,),
                channel_mult=(1, 2), num_heads=4, context_dim=32,
                enable_lora=enable_lora),
            vae_config=VAEConfig(ch=16, ch_mult=(1, 2, 2, 2), num_res_blocks=1),
            text_config=CLIPTextConfig(vocab_size=49408, width=32, layers=1,
                                       heads=4))
    return SDModels.create(family=family, dtype=dtype, enable_lora=enable_lora)


def load_params(models, ckpt_path: Optional[str], height: int, width: int,
                seed: int = 0):
    """Checkpoint resolution: orbax dir > torch .ckpt/.pt > .safetensors >
    random init (with a loud warning)."""
    import jax.numpy as jnp

    if ckpt_path and os.path.isdir(ckpt_path):
        from minddiffusion_tpu.io.checkpoints import load_checkpoint

        return load_checkpoint(ckpt_path)
    if ckpt_path:
        from minddiffusion_tpu.io import sd_weights

        if ckpt_path.endswith(".safetensors"):
            sd = sd_weights.load_safetensors(ckpt_path)
        else:
            with open(ckpt_path, "rb") as f:
                magic = f.read(4)
            if magic[:2] in (b"PK", b"\x80\x02", b"\x80\x03", b"\x80\x04", b"\x80\x05"):
                sd = sd_weights.load_torch_checkpoint(ckpt_path)
            else:
                # MindSpore protobuf checkpoint (the reference's format)
                from minddiffusion_tpu.io.ms_checkpoint import (
                    load_ms_checkpoint, ms_to_ldm_names)

                sd = ms_to_ldm_names(load_ms_checkpoint(ckpt_path))
        abstract = {
            "unet": jax.eval_shape(lambda: models.unet.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, height // 8, width // 8, models.unet.config.in_channels)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 77, models.unet.config.context_dim)))),
            "vae": jax.eval_shape(lambda: models.vae.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))),
            "text": jax.eval_shape(lambda: models.text_encoder.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))),
        }
        params, report = sd_weights.convert_sd_checkpoint(sd, abstract,
                                                          models.unet.config)
        for line in report[:20]:
            print(f"[weights] {line}")
        if len(report) > 20:
            print(f"[weights] ... {len(report) - 20} more")
        return params
    print("WARNING: no checkpoint given — using RANDOM weights (noise images)")
    return jax.jit(lambda r: models.init_params(r, height=height, width=width))(
        jax.random.PRNGKey(seed))


def tokenizer_for(family: str):
    if family == "sd2":
        from minddiffusion_tpu.text import ClipBpeTokenizer

        return ClipBpeTokenizer()
    from minddiffusion_tpu.text import WordpieceZhTokenizer

    return WordpieceZhTokenizer()


def save_images(images_uint8, outdir: str, prefix: str = "") -> list:
    from PIL import Image

    os.makedirs(outdir, exist_ok=True)
    existing = len([f for f in os.listdir(outdir) if f.endswith(".png")])
    paths = []
    for i, arr in enumerate(np.asarray(images_uint8)):
        p = os.path.join(outdir, f"{prefix}{existing + i:05d}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths
