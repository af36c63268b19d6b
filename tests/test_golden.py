"""Frozen-output regression: a fully deterministic tiny txt2img run must keep
producing the same image across refactors (the reference's analogue is its
demo/*.png golden images + pinned seeds, SURVEY.md §4). CPU-only numerics.

Regenerate after an *intentional* numerical change:
    python -m tests.test_golden
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from minddiffusion_tpu.models.clip import CLIPTextConfig
from minddiffusion_tpu.models.unet import UNetConfig
from minddiffusion_tpu.models.vae import VAEConfig
from minddiffusion_tpu.pipelines.stable_diffusion import SDModels, StableDiffusionPipeline

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tiny_txt2img.npy")


def _generate():
    models = SDModels.create(
        family="wukong", dtype=jnp.float32,
        unet_config=UNetConfig(in_channels=4, model_channels=32, out_channels=4,
                               num_res_blocks=1, attention_resolutions=(2,),
                               channel_mult=(1, 2), num_heads=4, context_dim=32),
        vae_config=VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1),
        text_config=CLIPTextConfig(vocab_size=64, width=32, layers=1, heads=4,
                                   context_length=8))
    params = models.init_params(jax.random.PRNGKey(11), height=32, width=32,
                                context_length=8)
    fn = StableDiffusionPipeline(models).build_txt2img(
        height=32, width=32, num_steps=5, sampler="plms", guidance_scale=4.0,
        batch_size=1)
    toks = jnp.full((1, 8), 3, jnp.int32)
    return np.asarray(fn(params, toks, jnp.zeros_like(toks), jax.random.PRNGKey(42)))


def test_golden_tiny_txt2img():
    img = _generate()
    golden = np.load(GOLDEN)
    # tolerate 1 uint8 step of fused-op reassociation drift
    diff = np.abs(img.astype(np.int32) - golden.astype(np.int32))
    assert diff.max() <= 1, f"max drift {diff.max()}, mean {diff.mean():.3f}"


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.save(GOLDEN, _generate())
    print("regenerated", GOLDEN)
