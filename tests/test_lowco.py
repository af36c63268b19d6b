"""conv3x3_lowco (taps-in-N low-output-channel conv) == direct conv."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddiffusion_tpu.ops.lowco import conv3x3_lowco, lowco_wins


@pytest.mark.parametrize("shape,co", [
    ((2, 8, 8, 5), 2),
    ((1, 10, 6, 192), 6),
    ((2, 8, 8, 96), 3),
])
def test_lowco_matches_direct(shape, co):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, shape[-1], co) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(co), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    out = conv3x3_lowco(x, k, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_lowco_bf16_and_grads():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 96), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, 96, 4) * 0.1, jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = conv3x3_lowco(x, k.astype(jnp.bfloat16), None)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)
    g = jax.grad(lambda kk: jnp.sum(
        conv3x3_lowco(x.astype(jnp.float32), kk, None) ** 2))(k)
    assert np.isfinite(np.asarray(g)).all() and float(np.abs(g).sum()) > 0


def test_lowco_gate():
    assert lowco_wins(256, 256, 192, 6)      # GLIDE SR out_conv
    assert not lowco_wins(64, 64, 320, 4)    # SD2 UNet out_conv: small spatial
    assert lowco_wins(512, 512, 128, 3)      # VAE decode tail
    assert not lowco_wins(256, 256, 192, 64)
