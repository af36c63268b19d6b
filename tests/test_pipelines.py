"""End-to-end pipeline tests at tiny configs: one jitted program per flow."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddiffusion_tpu.models.clip import CLIPTextConfig
from minddiffusion_tpu.models.unet import UNetConfig
from minddiffusion_tpu.models.vae import VAEConfig
from minddiffusion_tpu.pipelines.stable_diffusion import SDModels, StableDiffusionPipeline


def tiny_models(in_channels=4):
    return SDModels.create(
        family="wukong", dtype=jnp.float32,
        unet_config=UNetConfig(
            in_channels=in_channels, model_channels=32, out_channels=4,
            num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
            num_heads=4, context_dim=32,
        ),
        vae_config=VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1),
        text_config=CLIPTextConfig(vocab_size=64, width=32, layers=1, heads=4,
                                   context_length=8),
    )


@pytest.fixture(scope="module")
def setup():
    models = tiny_models()
    params = models.init_params(jax.random.PRNGKey(0), height=64, width=64,
                                context_length=8)
    return models, params


def tokens(b, fill):
    return jnp.full((b, 8), fill, jnp.int32)


@pytest.mark.parametrize("sampler", ["ddim", "plms", "dpm", "dpm_singlestep"])
def test_txt2img_all_samplers(setup, sampler):
    models, params = setup
    pipe = StableDiffusionPipeline(models)
    fn = pipe.build_txt2img(height=64, width=64, num_steps=4, sampler=sampler,
                            guidance_scale=7.5, batch_size=2)
    img = fn(params, tokens(2, 3), tokens(2, 0), jax.random.PRNGKey(1))
    assert img.shape == (2, 64, 64, 3)
    assert img.dtype == jnp.uint8
    # deterministic for a fixed key
    img2 = fn(params, tokens(2, 3), tokens(2, 0), jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img2))
    # different key -> different image
    img3 = fn(params, tokens(2, 3), tokens(2, 0), jax.random.PRNGKey(2))
    assert not np.array_equal(np.asarray(img), np.asarray(img3))


def test_txt2img_non_square(setup):
    """Wide-aspect generation (the reference's wukong capacity claim is
    2x 1024x768/chip, README_EN.md:59) — H != W through the whole program."""
    models, params = setup
    pipe = StableDiffusionPipeline(models)
    fn = pipe.build_txt2img(height=96, width=64, num_steps=3, batch_size=2)
    img = fn(params, tokens(2, 3), tokens(2, 0), jax.random.PRNGKey(1))
    assert img.shape == (2, 96, 64, 3) and img.dtype == jnp.uint8
    assert np.isfinite(np.asarray(img).astype(np.float32)).all()


def test_img2img(setup):
    models, params = setup
    pipe = StableDiffusionPipeline(models)
    fn = pipe.build_img2img(height=64, width=64, num_steps=4, strength=0.5)
    init = jnp.zeros((1, 64, 64, 3))
    img = fn(params, init, tokens(1, 3), tokens(1, 0), jax.random.PRNGKey(1))
    assert img.shape == (1, 64, 64, 3)
    assert img.dtype == jnp.uint8


def test_inpaint_9ch():
    models = tiny_models(in_channels=9)
    params = models.init_params(jax.random.PRNGKey(0), height=64, width=64,
                                context_length=8)
    pipe = StableDiffusionPipeline(models)
    fn = pipe.build_inpaint(height=64, width=64, num_steps=4)
    image = jnp.zeros((1, 64, 64, 3))
    mask = jnp.zeros((1, 64, 64, 1)).at[:, 16:48, 16:48].set(1.0)
    img = fn(params, image, mask, tokens(1, 3), tokens(1, 0), jax.random.PRNGKey(1))
    assert img.shape == (1, 64, 64, 3)


def test_inpaint_requires_9ch(setup):
    models, _ = setup
    with pytest.raises(AssertionError):
        StableDiffusionPipeline(models).build_inpaint(height=64, width=64)


def test_txt2img_on_serving_mesh(setup):
    """Multi-chip serving path (build_txt2img(mesh=...)): the request batch is
    split over the mesh's data axes, params replicated — the program must
    compile, execute, and match the single-device result exactly for the same
    key (GSPMD partitions the same math; fp32 tiny model is bitwise-stable)."""
    from minddiffusion_tpu.parallel import mesh as mesh_lib

    models, params = setup
    pipe = StableDiffusionPipeline(models)
    mesh = mesh_lib.make_mesh(mesh_lib.MeshConfig(dp=-1, fsdp=2, tp=1))
    fn_mesh = pipe.build_txt2img(height=64, width=64, num_steps=4,
                                 sampler="ddim", guidance_scale=7.5,
                                 batch_size=8, mesh=mesh)
    fn_single = pipe.build_txt2img(height=64, width=64, num_steps=4,
                                   sampler="ddim", guidance_scale=7.5,
                                   batch_size=8)
    img_m = fn_mesh(params, tokens(8, 3), tokens(8, 0), jax.random.PRNGKey(1))
    img_s = fn_single(params, tokens(8, 3), tokens(8, 0), jax.random.PRNGKey(1))
    assert img_m.shape == (8, 64, 64, 3) and img_m.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(img_m), np.asarray(img_s))

