"""Real-TPU training-gradient smoke (skipped on the CPU CI mesh).

This is the check that caught two latent backward-pass bugs: pallas_call is
not linearizable (fixed by the einsum-recompute custom_vjps in
ops/attention.py) and the mixed bf16/fp32 conv in the winograd VJP violates
the lax conv transpose rule (fixed in ops/winograd._direct_ref). Run it on a
TPU host: `JAX_PLATFORMS='' python -m pytest tests/test_tpu_train_grads.py`.
"""
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="exercises the Pallas kernels' VJPs on-chip")
def test_tpu_grads_flow_through_all_kernels():
    from minddiffusion_tpu.models.unet import UNetConfig, UNetModel

    cfg = UNetConfig.sd2(dtype=jnp.bfloat16, model_channels=320,
                         channel_mult=(1, 2), num_res_blocks=1,
                         attention_resolutions=(1,))
    model = UNetModel(cfg)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(9), 3)
    x = jax.random.normal(k1, (2, 32, 32, 4), jnp.bfloat16)
    t = jnp.array([3, 700], jnp.int32)
    ctx = jax.random.normal(k2, (2, 77, 1024), jnp.bfloat16)
    noise = jax.random.normal(k3, (2, 32, 32, 4), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, ctx)
    params = jax.tree.map(
        lambda l: jax.random.normal(jax.random.PRNGKey(1), l.shape, l.dtype) * 0.02
        if float(jnp.abs(l).sum()) == 0 else l, params)

    def loss(p):
        eps = model.apply(p, x, t, ctx)
        return jnp.mean((eps.astype(jnp.float32) - noise) ** 2)

    g = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    assert all(float(jnp.abs(l).sum()) > 0 for l in leaves)
