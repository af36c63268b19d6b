"""GLIDE family tests at tiny configs: models, learned-variance split, cascade."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddiffusion_tpu.models.glide import (
    GlideUNetConfig,
    SuperResText2ImUNet,
    Text2ImUNet,
    XfConfig,
)
from minddiffusion_tpu.models.srgan import SRGANGenerator, pixel_shuffle_2x
from minddiffusion_tpu.pipelines.glide_cascade import (
    GlideCascadePipeline,
    GlideModels,
    quantize_roundtrip,
)


def tiny_unet(**kw):
    kw.setdefault("in_channels", 3)
    kw.setdefault("model_channels", 32)
    kw.setdefault("num_res_blocks", 1)
    kw.setdefault("attention_resolutions", (2,))
    kw.setdefault("channel_mult", (1, 2))
    kw.setdefault("num_head_channels", 16)
    return GlideUNetConfig(**kw)


def tiny_xf():
    return XfConfig(width=32, layers=2, heads=4, text_ctx=8, n_vocab=64)


def unzero_head(params):
    """Every ResBlock/attention output conv is zero-init (reference
    zero_module design), making the whole UNet an identity at init —
    conditioning sensitivity tests need those kernels de-zeroed."""
    keys = iter(jax.random.split(jax.random.PRNGKey(9), 4096))

    def dezero(leaf):
        if leaf.ndim >= 2 and bool((leaf == 0).all()):
            return jax.random.normal(next(keys), leaf.shape, leaf.dtype) * 0.05
        return leaf

    return jax.tree.map(dezero, params)


def test_text2im_outputs_eps_and_variance():
    model = Text2ImUNet(tiny_unet(), tiny_xf())
    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.array([0, 59])
    toks = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, toks, mask)
    eps, v = model.apply(params, x, t, toks, mask)
    assert eps.shape == (2, 16, 16, 3) and v.shape == (2, 16, 16, 3)


def test_xf_padding_embedding_masks_tokens():
    model = Text2ImUNet(tiny_unet(), tiny_xf())
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
    t = jnp.array([10])
    toks = jnp.ones((1, 8), jnp.int32)
    params = unzero_head(
        model.init(jax.random.PRNGKey(0), x, t, toks, jnp.ones((1, 8), jnp.int32))
    )
    full_mask = jnp.ones((1, 8), jnp.int32)
    half_mask = jnp.concatenate([jnp.ones((1, 4), jnp.int32), jnp.zeros((1, 4), jnp.int32)], 1)
    eps_full, _ = model.apply(params, x, t, toks, full_mask)
    eps_half, _ = model.apply(params, x, t, toks, half_mask)
    # masked positions use the padding embedding -> output must differ
    assert not np.allclose(np.asarray(eps_full), np.asarray(eps_half))
    # but changing a *masked-out* token id must NOT change the output
    toks2 = toks.at[0, 6].set(33)
    eps_half2, _ = model.apply(params, x, t, toks2, half_mask)
    np.testing.assert_allclose(np.asarray(eps_half), np.asarray(eps_half2), atol=1e-6)


def test_superres_concats_upsampled_lowres():
    model = SuperResText2ImUNet(tiny_unet(in_channels=6), tiny_xf())
    x = jnp.zeros((1, 32, 32, 3))
    low = jnp.zeros((1, 16, 16, 3))
    t = jnp.array([5])
    toks = jnp.ones((1, 8), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    params = unzero_head(model.init(jax.random.PRNGKey(0), x, t, low, toks, mask))
    eps, v = model.apply(params, x, t, low, toks, mask)
    assert eps.shape == (1, 32, 32, 3)
    # low_res actually conditions the output
    low2 = jnp.ones_like(low) * 0.5
    eps2, _ = model.apply(params, x, t, low2, toks, mask)
    assert not np.allclose(np.asarray(eps), np.asarray(eps2))


def test_quantize_roundtrip():
    x = jnp.array([-1.0, -0.5004, 0.0, 0.33333, 1.0])
    q = quantize_roundtrip(x)
    u8 = np.round((np.asarray(x) + 1) * 127.5)
    np.testing.assert_allclose(np.asarray(q), u8 / 127.5 - 1, atol=1e-6)


def test_pixel_shuffle_is_depth_to_space():
    x = jnp.arange(1 * 2 * 2 * 8, dtype=jnp.float32).reshape(1, 2, 2, 8)
    y = pixel_shuffle_2x(x)
    assert y.shape == (1, 4, 4, 2)
    # spot-check the standard depth-to-space layout
    np.testing.assert_allclose(np.asarray(y[0, 0, 0]), np.asarray(x[0, 0, 0, 0:2]))
    np.testing.assert_allclose(np.asarray(y[0, 0, 1]), np.asarray(x[0, 0, 0, 2:4]))
    np.testing.assert_allclose(np.asarray(y[0, 1, 0]), np.asarray(x[0, 0, 0, 4:6]))


def test_srgan_shapes():
    gen = SRGANGenerator(upscale_factor=4, channels=16)
    x = jnp.zeros((1, 8, 8, 3))
    variables = gen.init(jax.random.PRNGKey(0), x)
    out = gen.apply(variables, x)
    assert out.shape == (1, 32, 32, 3)
    assert float(jnp.abs(out).max()) <= 1.0


def test_blocked_tail_conv_matches_direct():
    """The s2d4 blocked form of the final 9x9 conv (the 1024² 3-channel
    lane-utilization fix) must equal the direct conv exactly."""
    from minddiffusion_tpu.models.srgan import blocked_tail_conv

    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (2, 16, 24, 8), jnp.float32)
    kernel = jax.random.normal(k2, (9, 9, 8, 3), jnp.float32) * 0.1
    bias = jax.random.normal(k3, (3,), jnp.float32)
    direct = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    blocked = blocked_tail_conv(x, kernel, bias)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(direct),
                               rtol=1e-5, atol=1e-5)


def test_cascade_end_to_end_tiny():
    models = GlideModels.create(
        dtype=jnp.float32,
        base_respacing="5",
        sr_respacing="4",
        base_unet=tiny_unet(),
        sr_unet=tiny_unet(in_channels=6),
        xf=tiny_xf(),
        with_srgan=True,
    )
    params = models.init_params(jax.random.PRNGKey(0), base_size=16, sr_size=32)
    pipe = GlideCascadePipeline(models)
    fn = pipe.build_generate(batch_size=2, base_size=16, sr_size=32)
    toks = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    out = fn(params, toks, mask, jax.random.PRNGKey(1))
    assert out["base"].shape == (2, 16, 16, 3) and out["base"].dtype == jnp.uint8
    assert out["super_res"].shape == (2, 32, 32, 3)
    assert out["srgan"].shape == (2, 128, 128, 3)


def test_cascade_per_step_uncond_parity_mode():
    """uncond_mode='per_step' (reference-exact CFG: guider.py:36-50 redraws
    random uncond tokens every step) runs, and actually differs from the
    hoisted per-generation path while agreeing on shapes."""
    models = GlideModels.create(
        dtype=jnp.float32, base_respacing="4", sr_respacing="3",
        base_unet=tiny_unet(), sr_unet=tiny_unet(in_channels=6),
        xf=tiny_xf(), with_srgan=False,
    )
    params = models.init_params(jax.random.PRNGKey(0), base_size=16, sr_size=32)
    params = {k: unzero_head(v) for k, v in params.items()}
    pipe = GlideCascadePipeline(models)
    toks = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    common_kw = dict(batch_size=2, base_size=16, sr_size=32, guidance_scale=5.0)
    out_gen = pipe.build_generate(**common_kw, uncond_mode="per_generation")(
        params, toks, mask, jax.random.PRNGKey(1))
    out_step = pipe.build_generate(**common_kw, uncond_mode="per_step")(
        params, toks, mask, jax.random.PRNGKey(1))
    assert out_step["base"].shape == out_gen["base"].shape
    # different uncond token streams => different images (same master key)
    assert np.asarray(out_step["base"]).astype(np.int32).sum() != \
        np.asarray(out_gen["base"]).astype(np.int32).sum()
    with pytest.raises(ValueError):
        pipe.build_generate(**common_kw, uncond_mode="bogus")


def test_glide_encoder_kv_capture_roundtrip():
    """Encoder K/V captured via the `xattn_kv` collection (loop-invariant xf
    hoisting, glide_cascade._hoist_invariants) must reproduce the direct
    denoise exactly for a different x with the same encoding."""
    model = Text2ImUNet(tiny_unet(), tiny_xf())
    ks = jax.random.split(jax.random.PRNGKey(11), 5)
    tok = jax.random.randint(ks[0], (2, 8), 0, 64)
    msk = jnp.ones((2, 8), jnp.int32)
    x = jax.random.normal(ks[1], (2, 16, 16, 3))
    t = jnp.array([3, 7])
    v = model.init(ks[2], x, t, tok, msk)
    v = {"params": unzero_head(v["params"])}
    xf_proj, xf_out = model.apply(v, tok, msk, method=model.encode_text)
    base = model.apply(v, x, t, xf_proj, xf_out, method=model.denoise)
    _, cap = model.apply(v, x, t, xf_proj, xf_out, method=model.denoise,
                         mutable=["xattn_kv"])
    assert jax.tree.leaves(cap["xattn_kv"]), "no encoder K/V captured"
    x2 = jax.random.normal(ks[3], (2, 8, 8, 3))
    direct = model.apply(v, x2, t, xf_proj, xf_out, method=model.denoise)
    hoisted = model.apply({**v, "xattn_kv": cap["xattn_kv"]}, x2, t,
                          xf_proj, xf_out, method=model.denoise)
    for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(hoisted)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
