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
