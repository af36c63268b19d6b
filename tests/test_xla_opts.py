"""MDT_XLA_OPTS plumbing: env parse, jax.jit passthrough, compiled dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minddiffusion_tpu.utils import xla_opts


def test_parse(monkeypatch):
    monkeypatch.delenv("MDT_XLA_OPTS", raising=False)
    assert xla_opts.compiler_options() is None
    monkeypatch.setenv("MDT_XLA_OPTS", " xla_tpu_a=true , xla_tpu_b=8 ")
    assert xla_opts.compiler_options() == {"xla_tpu_a": "true",
                                           "xla_tpu_b": "8"}
    monkeypatch.setenv("MDT_XLA_OPTS", "garbage")
    with pytest.raises(ValueError):
        xla_opts.compiler_options()


def test_shipped_defaults(monkeypatch):
    # SHIPPED winners are TPU-only; on the CPU test backend they are ignored,
    # but env entries still apply and "off" kills everything.
    monkeypatch.setattr(xla_opts, "SHIPPED", {"xla_tpu_w": "true"})
    monkeypatch.delenv("MDT_XLA_OPTS", raising=False)
    assert xla_opts.compiler_options() is None  # cpu backend -> no SHIPPED
    monkeypatch.setenv("MDT_XLA_OPTS", "xla_tpu_b=8")
    assert xla_opts.compiler_options() == {"xla_tpu_b": "8"}
    monkeypatch.setenv("MDT_XLA_OPTS", "off")
    assert xla_opts.compiler_options() is None
    # on a TPU backend SHIPPED would merge under env entries
    monkeypatch.setattr(xla_opts.jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("MDT_XLA_OPTS", "xla_tpu_b=8")
    assert xla_opts.compiler_options() == {"xla_tpu_w": "true",
                                           "xla_tpu_b": "8"}
    monkeypatch.setenv("MDT_XLA_OPTS", "xla_tpu_w=false")
    assert xla_opts.compiler_options() == {"xla_tpu_w": "false"}


def test_passthrough_is_plain_jit(monkeypatch):
    monkeypatch.delenv("MDT_XLA_OPTS", raising=False)
    f = xla_opts.jit(lambda x: x + 1)
    assert isinstance(f, type(jax.jit(lambda x: x)))
    np.testing.assert_array_equal(np.asarray(f(jnp.zeros(3))), np.ones(3))


def test_compiled_dispatch_and_cache(monkeypatch):
    # xla_backend_optimization_level is accepted by the CPU backend too
    monkeypatch.setenv("MDT_XLA_OPTS", "xla_backend_optimization_level=1")
    calls = [0]

    def fn(x):
        calls[0] += 1
        return x * 2

    f = xla_opts.jit(fn)
    a = f(jnp.ones((4,)))
    b = f(jnp.ones((4,)))                    # same signature: cached program
    c = f(jnp.ones((2, 2)))                  # new signature: second compile
    np.testing.assert_array_equal(np.asarray(a), 2 * np.ones(4))
    np.testing.assert_array_equal(np.asarray(b), 2 * np.ones(4))
    np.testing.assert_array_equal(np.asarray(c), 2 * np.ones((2, 2)))
    assert calls[0] == 2  # traced once per signature, never per call
    assert hasattr(f, "lower")
