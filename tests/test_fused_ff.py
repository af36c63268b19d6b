"""Fused LN+GEGLU-FF kernel parity (ops/fused_ff.py) vs the unfused flax path.

The fusion must be invisible: same math (reference attention.py:60-74 GEGLU
FF with pre-LN and residual) and the SAME param tree, so checkpoints trained
either way interchange.
"""
import jax
import jax.numpy as jnp
import numpy as np

from minddiffusion_tpu.models.attention import BasicTransformerBlock
from minddiffusion_tpu.ops.fused_ff import _ff_reference, fused_ln_geglu_ff


def _random_ff_params(rng, c, f2):
    ks = jax.random.split(rng, 6)
    return dict(
        ln_scale=1.0 + 0.1 * jax.random.normal(ks[0], (c,)),
        ln_bias=0.1 * jax.random.normal(ks[1], (c,)),
        w1=jax.random.normal(ks[2], (c, f2)) / np.sqrt(c),
        b1=0.1 * jax.random.normal(ks[3], (f2,)),
        w2=jax.random.normal(ks[4], (f2 // 2, c)) / np.sqrt(f2 // 2),
        b2=0.1 * jax.random.normal(ks[5], (c,)),
    )


def test_fused_ff_kernel_matches_reference_interpret():
    c, f2, n = 64, 256, 40  # n not divisible by block -> exercises row padding
    p = _random_ff_params(jax.random.PRNGKey(0), c, f2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, n, c), jnp.float32)
    ref = _ff_reference(x, p["ln_scale"], p["ln_bias"], p["w1"], p["b1"],
                        p["w2"], p["b2"], eps=1e-5)
    got = fused_ln_geglu_ff(x, p["ln_scale"], p["ln_bias"], p["w1"], p["b1"],
                            p["w2"], p["b2"], block_rows=16,
                            interpret=True, force_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_ff_kernel_bf16_interpret():
    c, f2 = 128, 512
    p = _random_ff_params(jax.random.PRNGKey(2), c, f2)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 32, c)).astype(jnp.bfloat16)
    ref = _ff_reference(x, p["ln_scale"], p["ln_bias"], p["w1"], p["b1"],
                        p["w2"], p["b2"], eps=1e-5)
    got = fused_ln_geglu_ff(x, p["ln_scale"], p["ln_bias"], p["w1"], p["b1"],
                            p["w2"], p["b2"], block_rows=32,
                            interpret=True, force_pallas=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), rtol=0.05, atol=0.05)


def test_block_param_tree_identical_fused_vs_unfused():
    """fuse_ff must not change the checkpoint layout."""
    kw = dict(dim=64, heads=4, dim_head=16, context_dim=32, dtype=jnp.float32)
    x = jnp.ones((1, 8, 64))
    ctx = jnp.ones((1, 4, 32))
    rng = jax.random.PRNGKey(0)
    p_unfused = BasicTransformerBlock(**kw, fuse_ff=False).init(rng, x, ctx)
    p_fused = BasicTransformerBlock(**kw, fuse_ff=True).init(rng, x, ctx)
    t1 = jax.tree_util.tree_structure(p_unfused)
    t2 = jax.tree_util.tree_structure(p_fused)
    assert t1 == t2, (t1, t2)
    shapes1 = jax.tree.map(lambda a: a.shape, p_unfused)
    shapes2 = jax.tree.map(lambda a: a.shape, p_fused)
    assert shapes1 == shapes2


def test_block_output_matches_fused_vs_unfused():
    """Same params, same input -> same output (fused runs the jnp fallback on
    CPU; the kernel itself is covered by the interpret tests above)."""
    kw = dict(dim=64, heads=4, dim_head=16, context_dim=32, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 64))
    ctx = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 32))
    params = BasicTransformerBlock(**kw, fuse_ff=False).init(
        jax.random.PRNGKey(6), x, ctx)
    y1 = BasicTransformerBlock(**kw, fuse_ff=False).apply(params, x, ctx)
    y2 = BasicTransformerBlock(**kw, fuse_ff=True).apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=2e-5, atol=2e-5)


def test_fused_ff_subtiles_not_dividing_rows():
    """subtiles that don't divide the row block must degrade to a divisor,
    not silently skip the remainder rows (code-review r2: bn=81, subtiles=8
    left the last row as uninitialized VMEM)."""
    c, f2, n = 64, 256, 81  # bn = 81, subtiles 8 -> must degrade
    p = _random_ff_params(jax.random.PRNGKey(2), c, f2)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, n, c), jnp.float32)
    ref = _ff_reference(x, p["ln_scale"], p["ln_bias"], p["w1"], p["b1"],
                        p["w2"], p["b2"], eps=1e-5)
    got = fused_ln_geglu_ff(x, p["ln_scale"], p["ln_bias"], p["w1"], p["b1"],
                            p["w2"], p["b2"], subtiles=8,
                            interpret=True, force_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
