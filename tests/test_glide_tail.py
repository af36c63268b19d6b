"""Fused GLIDE SR sampler tail (ops/glide_tail): kernel parity in interpret
mode, loop-level equivalence against the unfused DDIM path, and routing."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddiffusion_tpu.models.glide import SuperResText2ImUNet
from minddiffusion_tpu.ops.glide_tail import (
    ddim_tail_step,
    ddim_tail_step_ref,
    tail_route,
)
from minddiffusion_tpu.samplers import ancestral
from minddiffusion_tpu.core.schedules import make_beta_schedule, respace_schedule, space_timesteps

from test_glide import tiny_unet, tiny_xf


def _rand_inputs(rng, b, h, w, c, dtype=jnp.bfloat16):
    hh = jnp.asarray(rng.randn(b, h, w, c), dtype)
    x = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    mult = jnp.asarray(rng.randn(b, c) * 0.5 + 1.0, jnp.float32)
    add = jnp.asarray(rng.randn(b, c) * 0.1, jnp.float32)
    wk = jnp.asarray(rng.randn(3, 3, c, 3) * 0.02, jnp.float32)
    bb = jnp.asarray(rng.randn(3) * 0.1, jnp.float32)
    coefs = jnp.asarray([1.21, 0.68, 0.97, 0.24], jnp.float32)
    return hh, x, mult, add, wk, bb, coefs


@pytest.mark.parametrize("shape", [(8, 16, 16, 192), (8, 24, 20, 64)])
def test_tail_kernel_matches_ref(shape):
    """Interpret-mode kernel vs the plain-XLA reference composition; covers
    multi-block grids, halo rows, and non-multiple-of-8 widths."""
    rng = np.random.RandomState(0)
    args = _rand_inputs(rng, *shape)
    ref = ddim_tail_step_ref(*args)
    got = ddim_tail_step(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-3, rtol=0)


def test_tail_kernel_edge_rows_zero_padded():
    """SAME-pad semantics at the image top/bottom: shifting the input by one
    row changes only rows the 3x3 stencil reaches — checked by comparing
    against the reference, which delegates padding to lax.conv."""
    rng = np.random.RandomState(1)
    args = _rand_inputs(rng, 8, 8, 12, 32)
    ref = ddim_tail_step_ref(*args)
    got = ddim_tail_step(*args, block_rows=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-3, rtol=0)


def test_tail_route():
    assert tail_route((8, 256, 256, 192), "tpu")
    assert not tail_route((8, 256, 256, 192), "cpu")
    assert not tail_route((2, 256, 256, 192), "tpu")   # batch not sublane-tiled
    assert not tail_route((8, 255, 256, 192), "tpu")   # odd height


def test_fused_tail_loop_matches_standard_loop():
    """ddim_sample_loop_fused_tail == ddim_sample_loop on a real (tiny,
    fp32) SuperRes model: same schedule, same x_T — the fused path only
    reassociates the GN statistics and keeps eps in fp32."""
    cfg = tiny_unet(in_channels=6)
    model = SuperResText2ImUNet(unet_config=cfg, xf_config=tiny_xf())
    b, size = 2, 16
    toks = jnp.ones((b, 8), jnp.int32)
    mask = jnp.ones((b, 8), jnp.int32)
    low = jnp.zeros((b, size // 2, size // 2, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((b, size, size, 3)), jnp.zeros((b,), jnp.int32),
                        low, toks, mask)
    xf_proj, xf_out = model.apply(params, toks, mask, method=model.encode_text)

    betas = make_beta_schedule("linear", 20)
    sched = respace_schedule(betas, space_timesteps(20, "4"))
    x_T = 0.9 * jax.random.normal(jax.random.PRNGKey(1), (b, size, size, 3))

    def model_fn(x, t_orig):
        return model.apply(params, x, t_orig, low, xf_proj, xf_out,
                           method=model.denoise)

    def features_fn(x, t_orig):
        return model.apply(params, x, t_orig, low, xf_proj, xf_out,
                           method=model.denoise_features)

    unet_p = params["params"]["unet"]
    tail = {
        "gn_scale": unet_p["out_norm"]["GroupNorm_0"]["scale"],
        "gn_bias": unet_p["out_norm"]["GroupNorm_0"]["bias"],
        "kernel": unet_p["out_conv"]["kernel"],
        "bias": unet_p["out_conv"]["bias"],
        "groups": 32,
        "eps": 1e-5,
    }
    ref = ancestral.ddim_sample_loop(model_fn, x_T, sched)
    got = ancestral.ddim_sample_loop_fused_tail(features_fn, tail, x_T, sched)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=0)


def test_cascade_runs_with_fused_tail(monkeypatch):
    """End-to-end cascade smoke with MDT_GLIDE_TUNE=tail=1 (CPU fallback path
    inside the fused loop) and output equivalence vs tail=0 within uint8
    quantization slack."""
    from minddiffusion_tpu.pipelines.glide_cascade import (
        GlideCascadePipeline, GlideModels)

    models = GlideModels.create(
        dtype=jnp.float32, base_respacing="3", sr_respacing="3",
        base_unet=tiny_unet(), sr_unet=tiny_unet(in_channels=6),
        xf=tiny_xf(), with_srgan=False)
    params = models.init_params(jax.random.PRNGKey(0), base_size=16, sr_size=32)
    pipe = GlideCascadePipeline(models)
    toks = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)

    outs = {}
    for tail in ("0", "1"):
        monkeypatch.setenv("MDT_GLIDE_TUNE", f"tail={tail}")
        fn = pipe.build_generate(batch_size=2, base_size=16, sr_size=32)
        outs[tail] = fn(params, toks, mask, jax.random.PRNGKey(1))
    assert outs["1"]["super_res"].shape == (2, 32, 32, 3)
    diff = (outs["1"]["super_res"].astype(np.int32)
            - outs["0"]["super_res"].astype(np.int32))
    assert np.abs(diff).max() <= 2, np.abs(diff).max()


def test_sd_txt2img_fused_tail_matches(monkeypatch):
    """SD2 fused DDIM tail (MDT_SD_TAIL=1): uint8 txt2img output matches the
    standard path within quantization slack on a tiny fp32 model (the fused
    path only reassociates GN stats and keeps eps fp32)."""
    from test_pipelines import tiny_models, tokens
    from minddiffusion_tpu.pipelines.stable_diffusion import StableDiffusionPipeline

    models = tiny_models()
    params = models.init_params(jax.random.PRNGKey(0), height=64, width=64,
                                context_length=8)
    pipe = StableDiffusionPipeline(models)
    outs = {}
    for v in ("0", "1"):
        monkeypatch.setenv("MDT_SD_TAIL", v)
        fn = pipe.build_txt2img(height=64, width=64, num_steps=4,
                                sampler="ddim", guidance_scale=7.5,
                                batch_size=2)
        outs[v] = np.asarray(fn(params, tokens(2, 3), tokens(2, 0),
                                jax.random.PRNGKey(1)))
    assert outs["1"].shape == outs["0"].shape
    diff = outs["1"].astype(np.int32) - outs["0"].astype(np.int32)
    assert np.abs(diff).max() <= 2, np.abs(diff).max()


def test_sd_fused_tail_with_cfg_dedup_off(monkeypatch):
    """The fused features path must also be correct WITHOUT cfg dedup (the
    wrapper then duplicates x itself)."""
    from test_pipelines import tiny_models, tokens
    from minddiffusion_tpu.pipelines.stable_diffusion import StableDiffusionPipeline

    models = tiny_models()
    params = models.init_params(jax.random.PRNGKey(0), height=64, width=64,
                                context_length=8)
    pipe = StableDiffusionPipeline(models)
    outs = {}
    monkeypatch.setenv("MDT_CFG_DEDUP", "0")
    for v in ("0", "1"):
        monkeypatch.setenv("MDT_SD_TAIL", v)
        fn = pipe.build_txt2img(height=64, width=64, num_steps=3,
                                sampler="ddim", guidance_scale=5.0,
                                batch_size=2)
        outs[v] = np.asarray(fn(params, tokens(2, 3), tokens(2, 0),
                                jax.random.PRNGKey(2)))
    diff = outs["1"].astype(np.int32) - outs["0"].astype(np.int32)
    assert np.abs(diff).max() <= 2, np.abs(diff).max()
