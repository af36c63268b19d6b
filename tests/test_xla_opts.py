"""MDT_XLA_OPTS plumbing: env parse, SHIPPED gating, jit behavior."""
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
    # on a TPU platform SHIPPED would merge under env entries (the probe is
    # platform-list based — it must not initialize the backend, ADVICE r3)
    monkeypatch.setattr(xla_opts, "_tpu_platform", lambda: True)
    monkeypatch.setenv("MDT_XLA_OPTS", "xla_tpu_b=8")
    assert xla_opts.compiler_options() == {"xla_tpu_w": "true",
                                           "xla_tpu_b": "8"}
    monkeypatch.setenv("MDT_XLA_OPTS", "xla_tpu_w=false")
    assert xla_opts.compiler_options() == {"xla_tpu_w": "false"}


def test_no_backend_touch_when_unset(monkeypatch):
    """With no env and no SHIPPED, compiler_options must not initialize a
    backend (on this container jax.default_backend() claims a TPU chip)."""
    monkeypatch.delenv("MDT_XLA_OPTS", raising=False)
    monkeypatch.setattr(xla_opts, "SHIPPED", {})

    def boom():  # pragma: no cover - should never run
        raise AssertionError("backend touched")

    monkeypatch.setattr(xla_opts.jax, "default_backend", boom)
    assert xla_opts.compiler_options() is None
    f = xla_opts.jit(lambda x: x + 1)
    assert isinstance(f, type(jax.jit(lambda x: x)))


def test_options_jit_keeps_jit_surface(monkeypatch):
    # xla_backend_optimization_level is accepted by the CPU backend too
    monkeypatch.setenv("MDT_XLA_OPTS", "xla_backend_optimization_level=1")
    f = xla_opts.jit(lambda x, s=1.0: x * s)
    np.testing.assert_array_equal(np.asarray(f(jnp.ones(4))), np.ones(4))
    # kwargs still work (a hand-rolled dispatch wrapper would lose them)
    np.testing.assert_array_equal(np.asarray(f(jnp.ones(4), s=2.0)),
                                  2 * np.ones(4))
    assert hasattr(f, "lower")
