"""Pallas attention kernel parity vs the fp32 einsum reference (interpret
mode on CPU; the same kernels compile on TPU — see bench history)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddiffusion_tpu.ops.attention import einsum_attention, packed_attention
from minddiffusion_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_packed,
)


def qkv(b, nq, nk, h, d, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (jax.random.normal(ks[0], (b, nq, h, d)),
            jax.random.normal(ks[1], (b, nk, h, d)),
            jax.random.normal(ks[2], (b, nk, h, d)))


@pytest.mark.parametrize("exact", [True, False])
@pytest.mark.parametrize("nq,nk,bq,bk", [
    (256, 256, 128, 128),   # multi k block (online softmax path)
    (256, 256, 128, 256),   # single k block path
    (300, 77, 128, 512),    # ragged q + cross-attn k
])
def test_bhnd_kernel_parity(exact, nq, nk, bq, bk):
    q, k, v = qkv(2, nq, nk, 4, 64)
    ref = einsum_attention(q, k, v)
    out = flash_attention(q, k, v, block_q=bq, block_k=bk,
                          exact_softmax=exact, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("heads", [1, 4])
def test_packed_kernel_parity(heads):
    b, n, d = 2, 256, 64
    c = heads * d
    q, k, v = qkv(b, n, n, heads, d, seed=3)
    ref = einsum_attention(q, k, v).reshape(b, n, c)
    out = flash_attention_packed(
        q.reshape(b, n, c), k.reshape(b, n, c), v.reshape(b, n, c),
        scale=d ** -0.5, heads=heads, block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_dispatcher_falls_back_below_threshold():
    # 77 tokens -> einsum path; result must equal reference exactly
    b, n, h, d = 2, 77, 4, 64
    q, k, v = qkv(b, n, n, h, d, seed=5)
    out = packed_attention(q.reshape(b, n, h * d), k.reshape(b, n, h * d),
                           v.reshape(b, n, h * d), heads=h)
    ref = einsum_attention(q, k, v).reshape(b, n, h * d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_fast_softmax_matches_exact():
    q, k, v = qkv(1, 256, 256, 2, 64, seed=7)
    a = flash_attention(q, k, v, exact_softmax=True, block_q=128, block_k=256,
                        interpret=True)
    b_ = flash_attention(q, k, v, exact_softmax=False, block_q=128, block_k=256,
                         interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)


def test_conv3x3_kernel_parity():
    from benchmarks.research.conv3x3 import conv3x3_pallas

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 16, 32))
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 32, 64)) * 0.1
    bias = jax.random.normal(jax.random.PRNGKey(2), (64,))
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    out = conv3x3_pallas(x, k, bias, block_rows=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_attention_ad_bridges_have_reference_grads():
    """The custom_vjp backward passes are the gradients of the einsum
    reference composition — check they produce finite, correctly-shaped
    cotangents (the pallas forward itself is TPU-only)."""
    from minddiffusion_tpu.ops.attention import _einsum_packed

    b, n, heads, d = 1, 128, 2, 64
    c = heads * d
    rng = np.random.RandomState(7)
    q, k, v = (jnp.asarray(rng.randn(b, n, c), jnp.float32) for _ in range(3))
    grads = jax.grad(lambda *a: _einsum_packed(*a, d ** -0.5, heads).sum(),
                     argnums=(0, 1, 2))(q, k, v)
    for g, ref in zip(grads, (q, k, v)):
        assert g.shape == ref.shape and np.isfinite(np.asarray(g)).all()
