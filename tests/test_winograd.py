"""Winograd F(2x2,3x3) conv parity vs XLA's direct conv (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddiffusion_tpu.ops.winograd import conv3x3_winograd, transform_weights


def direct_conv(x, k, b):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), k.astype(jnp.float32), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def test_weight_transform_shape_and_identity():
    k = jnp.zeros((3, 3, 5, 7)).at[1, 1, :, :].set(jnp.eye(5, 7))
    u = transform_weights(k)
    assert u.shape == (16, 5, 7)
    # identity kernel: G e11 G^T = outer([.5,.5...]) pattern, spot value
    np.testing.assert_allclose(np.asarray(u[5]), 0.25 * np.eye(5, 7), atol=1e-7)


@pytest.mark.parametrize("h,w,ci,co,bh", [
    (8, 8, 4, 8, 4),      # multi row-tile
    (6, 10, 3, 5, 6),     # ragged channels, single tile
    (12, 8, 8, 4, 8),     # rows not divisible by bh -> row padding
])
def test_winograd_matches_direct_conv(h, w, ci, co, bh):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(ks[0], (2, h, w, ci), jnp.float32)
    k = jax.random.normal(ks[1], (3, 3, ci, co), jnp.float32) * 0.2
    b = jax.random.normal(ks[2], (co,), jnp.float32)
    ref = direct_conv(x, k, b)
    got = conv3x3_winograd(x, k, b, block_rows=bh, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_winoconv_module_matches_nnconv_tree_and_output():
    """WinoConv3x3 must be checkpoint-identical to nn.Conv and numerically
    equal on the XLA path (CPU backend never dispatches to the kernel)."""
    import flax.linen as nn

    from minddiffusion_tpu.models.layers import WinoConv3x3

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8))
    ref_mod = nn.Conv(12, (3, 3), padding=1, param_dtype=jnp.float32)
    win_mod = WinoConv3x3(12)
    p_ref = ref_mod.init(jax.random.PRNGKey(1), x)
    p_win = win_mod.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_structure(p_ref)
            == jax.tree_util.tree_structure(p_win))
    assert (jax.tree.map(lambda a: a.shape, p_ref)
            == jax.tree.map(lambda a: a.shape, p_win))
    y_ref = ref_mod.apply(p_ref, x)
    y_win = win_mod.apply(p_ref, x)
    np.testing.assert_allclose(np.asarray(y_win), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    # gradient flows
    g = jax.grad(lambda p: win_mod.apply(p, x).sum())(p_ref)
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


def test_wino_shape_rule():
    from minddiffusion_tpu.ops.winograd import wino_wins

    assert wino_wins(16, 16, 1280, 1280)
    assert wino_wins(24, 24, 640, 640)           # 768px UNet level
    assert wino_wins(32, 32, 640, 640)           # e2e win (in-program)
    assert not wino_wins(64, 64, 320, 320)       # measured slower
    assert not wino_wins(8, 8, 1280, 1280)       # transform-bound
    assert not wino_wins(17, 16, 1280, 1280)     # odd spatial unsupported
    assert not wino_wins(16, 16, 2560, 1280)     # skip-concat conv: VMEM cap


def test_wino_shape_rule_env_overrides(monkeypatch):
    from minddiffusion_tpu.ops.winograd import wino_wins

    monkeypatch.setenv("MDT_WINO_TUNE", "hmax=64,cmin=320")
    assert wino_wins(64, 64, 320, 320)           # ds1 re-test config
    assert not wino_wins(128, 128, 320, 320)     # still bounded above
    monkeypatch.delenv("MDT_WINO_TUNE")
    assert not wino_wins(64, 64, 320, 320)       # defaults unchanged
    import pytest

    from minddiffusion_tpu.utils.flags import _parse_wino_tune
    with pytest.raises(ValueError, match="hmax"):   # clear config error,
        _parse_wino_tune("64")                      # not a deep trace crash
    with pytest.raises(ValueError, match="dma"):
        _parse_wino_tune("speed=9")


def test_winograd_hoisted_u_matches_inline_transform():
    """conv3x3_winograd(u=...) (scan-hoisted weight transform) must equal the
    transform-inside path bit-for-bit."""
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(ks[0], (2, 8, 8, 4), jnp.float32)
    k = jax.random.normal(ks[1], (3, 3, 4, 8)) * 0.2
    b = jax.random.normal(ks[2], (8,))
    inline = conv3x3_winograd(x, k, b, block_rows=4, interpret=True)
    hoisted = conv3x3_winograd(x, k, b, u=transform_weights(k), block_rows=4,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(inline), np.asarray(hoisted))


def test_u_slices_commute_with_transform():
    # U-slices commute with the weight transform (split-concat resblocks
    # capture per-slice U; layers.hoisted_wino_u relies on this identity)
    k = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 6, 4))
    np.testing.assert_allclose(
        np.asarray(transform_weights(k[:, :, :2])),
        np.asarray(transform_weights(k)[:, :2]), atol=1e-7)


def test_unet_wino_u_capture_roundtrip(monkeypatch):
    """The wino_u capture pass must record U for winograd-routed convs and
    reproduce the direct forward exactly when fed back. The shape rule is
    monkeypatched wide-open so the tiny CPU config exercises the mechanism
    (interpret-mode pallas on CPU)."""
    from minddiffusion_tpu.models.unet import UNetConfig, UNetModel
    from minddiffusion_tpu.models import layers
    from minddiffusion_tpu.ops import winograd

    monkeypatch.setattr(
        layers, "wino_route",
        lambda h, w, ci, co, **kw: h % 2 == 0 and w % 2 == 0)
    real = winograd.conv3x3_winograd

    def interp(x, kernel, bias=None, u=None, **kw):
        kw["interpret"] = True
        return real(x, kernel, bias, u, **kw)

    monkeypatch.setattr(winograd, "conv3x3_winograd", interp)
    monkeypatch.setattr(winograd, "conv3x3_winograd_ad", interp)

    cfg = UNetConfig(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2), num_heads=4,
        transformer_depth=1, context_dim=16)
    model = UNetModel(cfg)
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    x = jax.random.normal(ks[0], (1, 16, 16, cfg.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jax.random.normal(ks[1], (1, 5, cfg.context_dim))
    v = model.init(ks[2], x, t, ctx)
    base = model.apply(v, x, t, ctx)
    _, cap = model.apply(v, x, t, ctx, mutable=["wino_u"])
    assert jax.tree.leaves(cap["wino_u"]), "no U captured"
    hoisted = model.apply({**v, "wino_u": cap["wino_u"]}, x, t, ctx)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(hoisted))


@pytest.mark.parametrize("dma", [False, True])
def test_winograd_dma_variant_matches(dma):
    """The in-kernel-DMA halo path (overlapping windows fetched by the kernel
    itself) must match the host-gathered-tiles path and the direct conv."""
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    x = jax.random.normal(ks[0], (2, 12, 8, 8), jnp.float32)
    k = jax.random.normal(ks[1], (3, 3, 8, 4)) * 0.2
    b = jax.random.normal(ks[2], (4,))
    ref = direct_conv(x, k, b)
    got = conv3x3_winograd(x, k, b, block_rows=8, interpret=True, dma=dma)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_winograd_bf16():
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(ks[0], (1, 8, 8, 16)).astype(jnp.bfloat16)
    k = (jax.random.normal(ks[1], (3, 3, 16, 8)) * 0.2)
    b = jax.random.normal(ks[2], (8,))
    ref = direct_conv(x, k, b)
    got = conv3x3_winograd(x, k.astype(jnp.bfloat16), b, block_rows=4,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(ref),
                               rtol=0.1, atol=0.1)


def test_xattn_kv_capture_roundtrip():
    """Cross-attention K/V captured via the `xattn_kv` collection (loop-
    invariant context hoisting) must reproduce the direct forward exactly."""
    from minddiffusion_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig(
        in_channels=4, model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2), num_heads=4,
        transformer_depth=1, context_dim=16)
    model = UNetModel(cfg)
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    x = jax.random.normal(ks[0], (2, 16, 16, 4))
    t = jnp.array([3, 500])
    ctx = jax.random.normal(ks[1], (2, 5, 16))
    v = model.init(ks[2], x, t, ctx)
    base = model.apply(v, x, t, ctx)
    out_cap, cap = model.apply(v, x, t, ctx, mutable=["xattn_kv"])
    assert jax.tree.leaves(cap["xattn_kv"]), "capture pass collected nothing"
    np.testing.assert_array_equal(np.asarray(base), np.asarray(out_cap))
    # different x, same context: hoisted K/V must give identical results
    x2 = jax.random.normal(ks[3], (2, 16, 16, 4))
    direct = model.apply(v, x2, t, ctx)
    hoisted = model.apply({**v, "xattn_kv": cap["xattn_kv"]}, x2, t, ctx)
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(hoisted))


def test_resblock_fused_gn_prologue_matches_module_path(monkeypatch):
    """ResBlock with the GN+SiLU prologue folded into the (interpret-mode)
    winograd conv must match the GroupNorm32-module path."""
    from minddiffusion_tpu.models import layers
    from minddiffusion_tpu.models.unet import ResBlock
    from minddiffusion_tpu.ops import winograd

    real = winograd.conv3x3_winograd

    def interp(x, kernel, bias=None, u=None, gn_mult=None, gn_add=None, **kw):
        kw["interpret"] = True
        return real(x, kernel, bias, u, gn_mult, gn_add, **kw)

    monkeypatch.setattr(winograd, "conv3x3_winograd", interp)
    monkeypatch.setattr(winograd, "conv3x3_winograd_ad", interp)

    ks = jax.random.split(jax.random.PRNGKey(9), 4)
    x = jax.random.normal(ks[0], (2, 8, 8, 32))
    skip = jax.random.normal(ks[3], (2, 8, 8, 32))
    emb = jax.random.normal(ks[1], (2, 16))
    for use_ssn in (False, True):
        for use_skip in (False, True):
            block = ResBlock(out_channels=16, use_scale_shift_norm=use_ssn)
            args = (x, emb, skip) if use_skip else (x, emb)
            p = block.init(ks[2], *args)
            base = block.apply(p, *args)          # module GN path (no wino)
            monkeypatch.setattr(layers, "wino_route",
                                lambda h, w, ci, co, **kw: h % 2 == 0 and w % 2 == 0)
            fused = block.apply(p, *args)         # fused-prologue wino path
            monkeypatch.setattr(layers, "wino_route",
                                lambda h, w, ci, co, **kw: False)
            np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                                       rtol=3e-4, atol=3e-4)
    monkeypatch.undo()


@pytest.mark.parametrize("h,w", [(16, 16), (48, 16)])
def test_winograd_merged_chain_matches_composition(h, w):
    """conv1(out_merged) -> stats on the A-form -> conv2(premerged) must
    equal the plain conv -> GN-affine -> silu -> conv composition (the
    resblock conv_in/conv_out chain that skips all host formatting passes).
    (48, 16) exercises the widened single-tile block_rows path used by the
    768^2 configs' 48-row sites."""
    key = jax.random.split(jax.random.PRNGKey(7), 8)
    b, c = 2, 128
    x = jax.random.normal(key[0], (b, h, w, c), jnp.float32)
    k1 = jax.random.normal(key[1], (3, 3, c, c), jnp.float32) * 0.05
    b1 = jax.random.normal(key[2], (c,), jnp.float32) * 0.1
    k2 = jax.random.normal(key[3], (3, 3, c, c), jnp.float32) * 0.05
    b2 = jax.random.normal(key[4], (c,), jnp.float32) * 0.1
    m1 = jax.random.normal(key[5], (b, c), jnp.float32) * 0.2 + 1.0
    a1 = jax.random.normal(key[6], (b, c), jnp.float32) * 0.2
    m2 = jax.random.normal(key[7], (b, c), jnp.float32) * 0.2 + 1.0
    a2 = jnp.zeros((b, c), jnp.float32) + 0.1

    def direct(x_, k_, b_):
        y = jax.lax.conv_general_dilated(
            x_, k_, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b_

    def silu_affine(x_, m_, a_):
        f = x_ * m_[:, None, None, :] + a_[:, None, None, :]
        return f * jax.nn.sigmoid(f)

    ref_h = direct(silu_affine(x, m1, a1), k1, b1)
    ref = direct(silu_affine(ref_h, m2, a2), k2, b2)

    h_m = conv3x3_winograd(x, k1, b1, gn_mult=m1, gn_add=a1, dma=True,
                           interpret=True, out_merged=True)
    wcols = (w + 4) // 2
    wcols += (-wcols) % 8
    assert h_m.shape == (b, h, wcols, 2 * c), h_m.shape

    # A-form geometry: group g holds (col 2g-1 | col 2g); pads exact zero
    unmerged = np.zeros((b, h, w, c), np.float32)
    hm_np = np.asarray(h_m)
    for g in range(wcols):
        if 2 * g - 1 >= 0 and 2 * g - 1 < w:
            unmerged[:, :, 2 * g - 1] = hm_np[:, :, g, :c]
        if 2 * g < w:
            unmerged[:, :, 2 * g] = hm_np[:, :, g, c:]
    np.testing.assert_allclose(unmerged, np.asarray(ref_h), rtol=2e-4, atol=2e-4)
    # halo group 0 even-half and right pads must be exactly zero
    assert np.array_equal(hm_np[:, :, 0, :c], np.zeros((b, h, c), np.float32))
    assert np.array_equal(hm_np[:, :, w // 2 + 1:, c:], 
                          np.zeros((b, h, wcols - w // 2 - 1, c), np.float32))

    # per-channel sums from the merged form == sums of the unmerged oracle
    from minddiffusion_tpu.ops.winograd import merged_channel_sums

    s1, s2 = merged_channel_sums(h_m, c)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(ref_h).sum((1, 2)),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(s2), (np.asarray(ref_h) ** 2).sum((1, 2)),
        rtol=1e-3, atol=1e-3)

    out = conv3x3_winograd(h_m, k2, b2, gn_mult=m2, gn_add=a2, dma=True,
                           interpret=True, in_dims=(h, w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


def test_resblock_merged_chain_matches_module_path(monkeypatch):
    """Full ResBlock with the merged conv_in->conv_out chain (A-form between
    the convs, analytic emb fold, premerged conv_out) vs the plain module
    path. Chain engages only under the hoisted-u capture regime, mirroring
    the inference pipelines' capture->feed pattern."""
    from minddiffusion_tpu.models import layers
    from minddiffusion_tpu.models.unet import ResBlock
    from minddiffusion_tpu.ops import winograd

    real = winograd.conv3x3_winograd

    def interp(x, kernel, bias=None, u=None, gn_mult=None, gn_add=None, **kw):
        kw["interpret"] = True
        return real(x, kernel, bias, u, gn_mult, gn_add, **kw)

    monkeypatch.setattr(winograd, "conv3x3_winograd", interp)
    monkeypatch.setattr(winograd, "conv3x3_winograd_ad", interp)

    ks = jax.random.split(jax.random.PRNGKey(11), 4)
    x = jax.random.normal(ks[0], (2, 16, 16, 128))
    skip = jax.random.normal(ks[3], (2, 16, 16, 128))
    emb = jax.random.normal(ks[1], (2, 16))
    for use_ssn in (False, True):
        for use_skip in (False, True):
            block = ResBlock(out_channels=128, use_scale_shift_norm=use_ssn)
            args = (x, emb, skip) if use_skip else (x, emb)
            p = block.init(ks[2], *args)
            base = block.apply(p, *args)          # module GN path (no wino)
            monkeypatch.setattr(layers, "wino_route",
                                lambda h, w, ci, co, **kw: h % 2 == 0 and w % 2 == 0)
            # capture pass (computes hoisted U, engages the chain) ...
            chained, cap = block.apply(p, *args, mutable=["wino_u"])
            assert "wino_u" in cap and len(jax.tree.leaves(cap["wino_u"])) >= 2
            # ... then the feed-back pass the sampler scan uses
            chained2 = block.apply({**p, **cap}, *args)
            monkeypatch.setattr(layers, "wino_route",
                                lambda h, w, ci, co, **kw: False)
            np.testing.assert_allclose(np.asarray(chained), np.asarray(base),
                                       rtol=2e-3, atol=2e-3)
            np.testing.assert_allclose(np.asarray(chained2),
                                       np.asarray(chained), rtol=1e-6,
                                       atol=1e-6)
    monkeypatch.undo()


def test_wino_chain_disabled_with_dma_off(monkeypatch):
    """MDT_WINO_TUNE=dma=0 must disable chaining too: merged A-form I/O exists
    only on the DMA+GN kernel path (code-review r2: the opt-out previously
    tripped conv3x3_winograd's merged-I/O asserts)."""
    from minddiffusion_tpu.ops import winograd

    monkeypatch.delenv("MDT_WINO_TUNE", raising=False)
    assert winograd.wino_chain_ok(16, 16, 1280)
    monkeypatch.setenv("MDT_WINO_TUNE", "dma=0")
    assert not winograd.wino_chain_ok(16, 16, 1280)

def test_wino_shape_rule_fp32_itemsize():
    """fp32 models double the grid-resident U footprint — shapes that fit in
    bf16 can exceed the kernel's VMEM limit in fp32 and must be excluded
    (code-review r2: the rule hardcoded 2-byte weights)."""
    from minddiffusion_tpu.ops.winograd import wino_wins

    assert wino_wins(16, 16, 1280, 1280, itemsize=2)      # 52 MB bf16 U
    assert not wino_wins(16, 16, 1280, 1280, itemsize=4)  # 105 MB fp32 U
