"""ops/gn_stats: Pallas channel-sums kernel + the GN affine-prologue routes.

The kernel itself runs in interpreter mode here (tests are CPU-only); the
model-level tests force the routing gates so the exact traced graphs that
ship on TPU (affine-folded GN into non-wino convs, analytic emb fold) are
exercised numerically against the plain flax paths.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddiffusion_tpu.ops import gn_stats
from minddiffusion_tpu.ops.gn_stats import (
    channel_sums, channel_sums_pallas, channel_sums_ref)


@pytest.mark.parametrize("shape,dtype", [
    ((2, 16, 8, 96), jnp.float32),
    ((2, 64, 4, 320), jnp.bfloat16),
    ((1, 8, 8, 256), jnp.bfloat16),
    ((3, 10, 6, 32), jnp.float32),   # H with odd factor (block_rows=2)
])
def test_kernel_matches_reference(shape, dtype):
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    x = (x * 3.0 + 0.5).astype(dtype)
    s1, s2 = channel_sums_pallas(x, interpret=True)
    r1, r2 = channel_sums_ref(x)
    assert s1.dtype == jnp.float32 and s2.dtype == jnp.float32
    np.testing.assert_allclose(s1, r1, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(s2, r2, rtol=1e-5, atol=1e-4)


def test_block_rows_divides_and_bounds():
    for h in (8, 10, 64, 512, 6):
        bh = gn_stats._block_rows(h, 64, 320, 2)
        assert h % bh == 0
        assert bh * 64 * 320 * 2 <= gn_stats._BLOCK_BYTES or bh == 1


def test_custom_vjp_matches_reference_grad():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 32), jnp.float32)
    a = jax.random.normal(jax.random.PRNGKey(2), (2, 32), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(3), (2, 32), jnp.float32)

    def loss_kernel(x):
        s1, s2 = channel_sums(x)
        return jnp.sum(s1 * a) + jnp.sum(s2 * b)

    def loss_ref(x):
        r1, r2 = channel_sums_ref(x)
        return jnp.sum(r1 * a) + jnp.sum(r2 * b)

    g_k = jax.grad(loss_kernel)(x)
    g_r = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(g_k, g_r, rtol=1e-5, atol=1e-5)


def test_stats_route_gates():
    # CPU backend never routes; shape/size gates are pure functions of shape
    assert not gn_stats.stats_route((16, 64, 64, 320), 2)  # cpu backend
    big = 16 * 64 * 64 * 320 * 2
    assert big >= gn_stats.MIN_BYTES
    assert not gn_stats.stats_route((16, 64, 320), 2)      # not 4D


def test_groupnorm32_kernel_route_matches_flax(monkeypatch):
    """GroupNorm32's affine path (stats -> per-(B,C) mult/add) must match the
    flax GroupNorm path. Forces the route gate; channel_sums falls back to
    the jnp reduction on CPU, so this pins the affine algebra."""
    from minddiffusion_tpu.models import layers

    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 64), jnp.float32)
    gn = layers.GroupNorm32(num_groups=32, eps=1e-5)
    monkeypatch.setenv("MDT_GN_STATS", "0")
    params = gn.init(jax.random.PRNGKey(0), x)
    # perturb scale/bias so the affine terms actually matter
    params = jax.tree.map(
        lambda p: p + 0.3 * jax.random.normal(jax.random.PRNGKey(5), p.shape),
        params)
    y_flax = gn.apply(params, x)
    monkeypatch.setenv("MDT_GN_STATS", "all")
    monkeypatch.setattr(layers, "stats_route", lambda *a, **k: True)
    y_kernel = gn.apply(params, x)
    np.testing.assert_allclose(y_kernel, y_flax, rtol=2e-5, atol=2e-5)
    # param tree shape is identical on both paths
    p2 = gn.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(p2) == jax.tree.structure(params)


@pytest.mark.parametrize("use_sss", [False, True])
def test_resblock_gn_route_matches_plain(monkeypatch, use_sss):
    """ResBlock with the GN-stats fuse gates forced (the TPU shipping path:
    affine prologue into non-wino convs + analytic emb fold) must match the
    plain GroupNorm module path."""
    from minddiffusion_tpu.models import unet

    x = jax.random.normal(jax.random.PRNGKey(6), (2, 16, 16, 64), jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(7), (2, 128), jnp.float32)
    blk = unet.ResBlock(out_channels=64, dtype=jnp.float32,
                        use_scale_shift_norm=use_sss)
    monkeypatch.setenv("MDT_GN_STATS", "0")
    params = blk.init(jax.random.PRNGKey(0), x, emb)
    y_plain = blk.apply(params, x, emb)
    monkeypatch.setenv("MDT_GN_STATS", "all")
    monkeypatch.setattr(unet, "_gn_route", lambda *a, **k: True)
    y_fused = blk.apply(params, x, emb)
    np.testing.assert_allclose(y_fused, y_plain, rtol=2e-4, atol=2e-4)


def test_split_resblock_gn_route_matches_concat(monkeypatch):
    """Split-concat up-path resblock with forced GN-stats gates vs the
    materialized-concat plain path (param tree identical)."""
    from minddiffusion_tpu.models import unet

    x = jax.random.normal(jax.random.PRNGKey(8), (2, 16, 16, 64), jnp.float32)
    sk = jax.random.normal(jax.random.PRNGKey(9), (2, 16, 16, 32), jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(10), (2, 128), jnp.float32)
    blk = unet.ResBlock(out_channels=64, dtype=jnp.float32)
    monkeypatch.setenv("MDT_GN_STATS", "0")
    monkeypatch.setenv("MDT_SPLIT_CONCAT", "0")
    monkeypatch.setenv("MDT_MERGE_ALIGNED", "0")
    params = blk.init(jax.random.PRNGKey(0), jnp.concatenate([x, sk], -1), emb)
    y_plain = blk.apply(params, jnp.concatenate([x, sk], -1), emb)
    monkeypatch.setenv("MDT_GN_STATS", "all")
    monkeypatch.setattr(unet, "_gn_route", lambda *a, **k: True)
    y_split = blk.apply(params, x, emb, sk)
    np.testing.assert_allclose(y_split, y_plain, rtol=2e-4, atol=2e-4)


def test_merged_scope_resblock_matches_plain(monkeypatch):
    """MDT_GN_STATS=merged: only the norm_out of a merge-aligned resblock
    routes (drag=True); output must match the plain path. stats_route is
    forced (CPU backend); channel_sums falls back to the jnp reduction, so
    this pins the scoped code path's algebra."""
    from minddiffusion_tpu.models import unet

    x = jax.random.normal(jax.random.PRNGKey(11), (2, 4, 4, 320), jnp.float32)
    sk = jax.random.normal(jax.random.PRNGKey(12), (2, 4, 4, 320), jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(13), (2, 64), jnp.float32)
    blk = unet.ResBlock(out_channels=320, dtype=jnp.float32)
    monkeypatch.setenv("MDT_GN_STATS", "0")
    params = blk.init(jax.random.PRNGKey(0), x, emb, sk)
    y_plain = blk.apply(params, x, emb, sk)
    monkeypatch.setenv("MDT_GN_STATS", "merged")
    monkeypatch.setattr(unet, "_gn_route",
                        lambda shape, esz, drag=False: drag)
    y_scoped = blk.apply(params, x, emb, sk)
    np.testing.assert_allclose(y_scoped, y_plain, rtol=2e-4, atol=2e-4)


def test_transposed_kernel_matches_reference():
    x = (jax.random.normal(jax.random.PRNGKey(14), (3, 8, 4, 96)) * 2.0)
    s1, s2 = gn_stats.channel_sums_pallas_t(x, interpret=True)
    r1, r2 = channel_sums_ref(x)
    np.testing.assert_allclose(s1, r1, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(s2, r2, rtol=1e-5, atol=1e-4)


def test_merge_gate_rejects_low_waste_sum(monkeypatch):
    """r4e: merging the 960-ch (640+320) pair measured a clear e2e LOSS
    (1.9155 vs 1.941-1.943) — the gate must stay exact-128-aligned, so the
    960 case takes the split path (no 960-wide barrier fires)."""
    import os
    from minddiffusion_tpu.models import unet

    x = jax.random.normal(jax.random.PRNGKey(15), (2, 4, 4, 640), jnp.float32)
    sk = jax.random.normal(jax.random.PRNGKey(16), (2, 4, 4, 320), jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(17), (2, 64), jnp.float32)
    blk = unet.ResBlock(out_channels=320, dtype=jnp.float32)
    monkeypatch.setenv("MDT_GN_STATS", "0")
    monkeypatch.setenv("MDT_MERGE_ALIGNED", "1")
    params = blk.init(jax.random.PRNGKey(0), x, emb, sk)
    calls = []
    real = jax.lax.optimization_barrier
    monkeypatch.setattr(jax.lax, "optimization_barrier",
                        lambda v: calls.append(getattr(v, "shape", None)) or real(v))
    out = blk.apply(params, x, emb, sk)
    assert (2, 4, 4, 960) not in calls, "rejected low-waste merge re-enabled"
    assert np.isfinite(np.asarray(out)).all()
