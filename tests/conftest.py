"""Test env: force CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (a capability the reference lacks — it can only
test distributed code on a real Ascend cluster, SURVEY.md §4).

The container's sitecustomize registers and initializes the axon TPU-tunnel
PJRT backend at interpreter startup, before this file runs. The *CPU* backend,
however, is still uninitialized, so setting XLA_FLAGS now (pre-first-use) and
flipping jax_platforms to "cpu" reliably gives an 8-device virtual CPU mesh —
and keeps test compiles local instead of round-tripping the TPU tunnel.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# XLA:CPU compiles conv autodiff slowly; cache compilations across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/minddiffusion_jax_cache")

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute tests (subprocess compiles etc.)")
