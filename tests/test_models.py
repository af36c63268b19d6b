"""Shape/dtype contract tests for the model zoo at tiny configs (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddiffusion_tpu.models.unet import UNetConfig, UNetModel
from minddiffusion_tpu.models.vae import AutoencoderKL, VAEConfig
from minddiffusion_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder


def tiny_unet_config(**kw):
    return UNetConfig(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2), num_heads=4,
        transformer_depth=1, context_dim=16, **kw,
    )


def test_unet_forward_shapes():
    cfg = tiny_unet_config()
    model = UNetModel(cfg)
    x = jnp.zeros((2, 16, 16, 4))
    t = jnp.array([0, 999])
    ctx = jnp.zeros((2, 7, 16))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    out = model.apply(params, x, t, ctx)
    assert out.shape == x.shape
    assert out.dtype == jnp.float32


def test_unet_zero_init_head_gives_zero_at_init():
    cfg = tiny_unet_config()
    model = UNetModel(cfg)
    x = jnp.ones((1, 16, 16, 4))
    t = jnp.array([10])
    ctx = jnp.ones((1, 7, 16))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    out = model.apply(params, x, t, ctx)
    # out_conv is zero-init, so the whole output must be exactly zero
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_unet_sd2_vs_sd1_head_split():
    sd2 = UNetConfig.sd2()
    assert sd2.head_split(320) == (5, 64)
    assert sd2.head_split(1280) == (20, 64)
    sd1 = UNetConfig.sd1()
    assert sd1.head_split(320) == (8, 40)


def test_unet_inpaint_9ch():
    cfg = tiny_unet_config()
    cfg = cfg.replace(in_channels=9)
    model = UNetModel(cfg)
    x = jnp.zeros((1, 16, 16, 9))
    t = jnp.array([5])
    ctx = jnp.zeros((1, 7, 16))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    out = model.apply(params, x, t, ctx)
    assert out.shape == (1, 16, 16, 4)


def test_vae_roundtrip_shapes():
    cfg = VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1, z_channels=4, embed_dim=4)
    model = AutoencoderKL(cfg)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    moments = model.apply(params, x, method=model.encode)
    # one downsample level (len(ch_mult)-1 = 1): 32 -> 16
    assert moments.shape == (1, 16, 16, 8)
    z = jnp.zeros((1, 16, 16, 4))
    img = model.apply(params, z, method=model.decode)
    assert img.shape == (1, 32, 32, 3)
    assert img.dtype == jnp.float32


def test_clip_text_encoder_shapes_and_causality():
    cfg = CLIPTextConfig(vocab_size=64, width=32, layers=2, heads=4, context_length=8)
    model = CLIPTextEncoder(cfg)
    tokens = jnp.array([[1, 2, 3, 4, 0, 0, 0, 0]], dtype=jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens)
    out = model.apply(params, tokens)
    assert out.shape == (1, 8, 32)
    # causality: changing a later token must not affect earlier positions
    tokens2 = tokens.at[0, 5].set(7)
    out2 = model.apply(params, tokens2)
    np.testing.assert_allclose(np.asarray(out[:, :5]), np.asarray(out2[:, :5]),
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(out[:, 5:]), np.asarray(out2[:, 5:]))


def test_unet_lora_is_noop_at_init():
    cfg = tiny_unet_config(enable_lora=True)
    base_cfg = tiny_unet_config()
    model = UNetModel(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 4), jnp.float32)
    t = jnp.array([100])
    ctx = jnp.asarray(np.random.RandomState(1).randn(1, 7, 16), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)
    out = model.apply(params, x, t, ctx)
    # lora_b zero-init => adapter contributes nothing at init
    flat = jax.tree_util.tree_leaves_with_path(params)
    lora_bs = [l for p, l in flat if "lora_b" in jax.tree_util.keystr(p)]
    assert lora_bs, "expected LoRA params present"
    assert all((np.asarray(l) == 0).all() for l in lora_bs)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_adm_class_conditioning():
    """'adm' conditioning: label embedding added to t-emb (ddpm.py:360-379)."""
    import jax
    import jax.numpy as jnp
    from minddiffusion_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig(in_channels=4, model_channels=32, out_channels=4,
                     num_res_blocks=1, attention_resolutions=(2,),
                     channel_mult=(1, 2), num_heads=4, context_dim=32,
                     num_classes=10)
    model = UNetModel(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 8, 8, 4))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jax.random.normal(rng, (2, 5, 32))
    y = jnp.asarray([3, 7], jnp.int32)
    params = model.init(rng, x, t, ctx, y=y)
    assert "label_emb" in params["params"]
    # every residual-branch tail is a zero-conv at init (reference
    # zero_module), which kills the emb path; de-zero them so label changes
    # can reach the output
    params = jax.tree.map(
        lambda p: jnp.where(jnp.all(p == 0),
                            jax.random.normal(rng, p.shape) * 0.05, p),
        params)
    out_a = model.apply(params, x, t, ctx, y=y)
    out_b = model.apply(params, x, t, ctx, y=jnp.asarray([7, 3], jnp.int32))
    assert out_a.shape == (2, 8, 8, 4)
    # different labels must change the output
    assert float(jnp.abs(out_a - out_b).max()) > 1e-4
    # missing labels raise
    import pytest
    with pytest.raises(ValueError):
        model.apply(params, x, t, ctx)


def test_unet_cfg_fold_matches_duplicated_batch():
    """cfg_fold (CFG-prefix dedup) must equal applying the model to [x; x]
    with the same 2B folded context — including transformer depth>1 and the
    mid-attn-only fold edge (no down-path attention)."""
    for attn_res, depth in (((2, 1), 1), ((), 1), ((2,), 2)):
        cfg = tiny_unet_config()
        cfg = cfg.replace(attention_resolutions=attn_res,
                          transformer_depth=depth)
        model = UNetModel(cfg)
        rng = jax.random.PRNGKey(1)
        x = jax.random.normal(rng, (2, 16, 16, 4))
        t = jnp.array([3, 700])
        ctx4 = jax.random.normal(jax.random.PRNGKey(2), (4, 7, 16))
        params = model.init(jax.random.PRNGKey(0), x, t, ctx4[:2])

        ref = model.apply(params, jnp.concatenate([x, x], 0),
                          jnp.concatenate([t, t], 0), ctx4)
        out = model.apply(params, x, t, ctx4, cfg_fold=True)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_unet_cfg_fold_rejects_unfoldable():
    cfg = tiny_unet_config(num_classes=5)
    model = UNetModel(cfg)
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((2, 7, 16))
    y = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t, ctx[:1],
                        y=y[:1])
    with pytest.raises(ValueError):
        model.apply(params, x, t, ctx, y=y, cfg_fold=True)
    with pytest.raises(ValueError):
        model.apply(params, x, t, None, cfg_fold=True)


def test_unet_split_concat_matches_concat_path():
    """MDT_SPLIT_CONCAT=1 (concat-free up path) must match the concat path
    numerically with the identical param tree."""
    import os
    cfg = tiny_unet_config()
    model = UNetModel(cfg)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 4))
    t = jnp.array([1, 500])
    ctx = jax.random.normal(jax.random.PRNGKey(5), (2, 7, 16))
    os.environ["MDT_SPLIT_CONCAT"] = "0"
    try:
        params = model.init(jax.random.PRNGKey(6), x, t, ctx)
        ref = model.apply(params, x, t, ctx)
    finally:
        os.environ["MDT_SPLIT_CONCAT"] = "1"
    try:
        p2 = model.init(jax.random.PRNGKey(6), x, t, ctx)
        assert (jax.tree_util.tree_structure(p2)
                == jax.tree_util.tree_structure(params))
        out = model.apply(params, x, t, ctx)
    finally:
        os.environ.pop("MDT_SPLIT_CONCAT", None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_resblock_merge_aligned_matches_split(monkeypatch):
    """MDT_MERGE_ALIGNED=1 (barrier-materialized concat for misaligned
    halves whose sum is lane-aligned, the SD2 ds1 320+320=640 pattern) must
    match the split path numerically with the identical param tree.

    Channel widths satisfy the real gate (min(cx,cs) >= 256, halves
    misaligned, sum aligned) and a barrier spy asserts the merged branch
    actually executed (ADVICE r3: the old 64+64 version took the split path
    on both sides of the A/B)."""
    import os
    from minddiffusion_tpu.models.unet import ResBlock

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 320))
    s = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 320))
    emb = jax.random.normal(jax.random.PRNGKey(2), (2, 32))
    rb = ResBlock(out_channels=320, use_scale_shift_norm=True)
    os.environ["MDT_MERGE_ALIGNED"] = "0"
    try:
        params = rb.init(jax.random.PRNGKey(3), x, emb, skip=s)
        ref = rb.apply(params, x, emb, skip=s)
    finally:
        os.environ["MDT_MERGE_ALIGNED"] = "1"
    barrier_calls = []
    real_barrier = jax.lax.optimization_barrier

    def spy(v):
        barrier_calls.append(getattr(v, "shape", None))
        return real_barrier(v)

    monkeypatch.setattr(jax.lax, "optimization_barrier", spy)
    try:
        p2 = rb.init(jax.random.PRNGKey(3), x, emb, skip=s)
        assert (jax.tree_util.tree_structure(p2)
                == jax.tree_util.tree_structure(params))
        out = rb.apply(params, x, emb, skip=s)
    finally:
        os.environ.pop("MDT_MERGE_ALIGNED", None)
    assert (2, 4, 4, 640) in barrier_calls, \
        "merged-aligned branch did not execute (gate regressed?)"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_upsample_conv_matches_reference():
    """Subpixel-decomposed upsample+conv == nearest_upsample_2x then 3x3 conv."""
    from minddiffusion_tpu.models.layers import (
        fused_upsample_conv3x3, nearest_upsample_2x)

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 7, 5, 12), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 12, 9) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(9), jnp.float32)
    up = nearest_upsample_2x(x)
    ref = jax.lax.conv_general_dilated(
        up, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    out = fused_upsample_conv3x3(x, k, b, jnp.float32)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # grads flow (pure lax ops)
    g = jax.grad(lambda k_: fused_upsample_conv3x3(x, k_, b, jnp.float32).sum())(k)
    assert np.isfinite(np.asarray(g)).all()


def test_upsample_module_fused_matches_unfused():
    import os

    from minddiffusion_tpu.models.unet import Upsample

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 6))
    mod = Upsample(6)
    os.environ["MDT_FUSED_UP"] = "0"
    try:
        params = mod.init(jax.random.PRNGKey(1), x)
        ref = mod.apply(params, x)
    finally:
        os.environ["MDT_FUSED_UP"] = "1"
    try:
        p2 = mod.init(jax.random.PRNGKey(1), x)
        assert (jax.tree_util.tree_structure(p2)
                == jax.tree_util.tree_structure(params))
        out = mod.apply(params, x)
    finally:
        os.environ.pop("MDT_FUSED_UP", None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_cast_serving_params_is_output_preserving():
    """bf16 weight storage must be bit-identical to fp32 storage at serving.

    Every matmul/conv kernel is cast to the compute dtype in-graph before the
    op, so pre-casting the stored leaf (utils/params.cast_serving_params)
    cannot change any value entering the MXU; norm scales/biases (fp32
    application paths) must be left untouched.
    """
    from minddiffusion_tpu.utils.params import cast_serving_params

    cfg = tiny_unet_config(dtype=jnp.bfloat16)
    model = UNetModel(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    t = jnp.array([7, 123])
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 16))
    params = model.init(jax.random.PRNGKey(2), x, t, ctx)
    ref = model.apply(params, x, t, ctx)

    cast = cast_serving_params(params)
    leaves = jax.tree_util.tree_leaves_with_path(cast)
    kinds = {jnp.bfloat16: 0, jnp.float32: 0}
    for path, leaf in leaves:
        name = path[-1].key
        if name == "kernel":
            assert leaf.dtype == jnp.bfloat16, path
            kinds[jnp.bfloat16] += 1
        elif name in ("bias", "scale"):
            assert leaf.dtype == jnp.float32, path
            kinds[jnp.float32] += 1
    assert kinds[jnp.bfloat16] > 10 and kinds[jnp.float32] > 10

    out = model.apply(cast, x, t, ctx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
