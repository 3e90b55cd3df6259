"""Test config: force CPU backend with 8 virtual devices for sharding tests.

Mirrors the driver's multi-chip dry-run environment
(xla_force_host_platform_device_count); must run before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
# XLA-CPU's space-to-batch pass hits an internal CHECK (shape_inference.cc)
# when compiling the fused cooperative train step's conv graph; disable it
# (correctness-neutral: it is a layout optimization).
if "space-to-batch-converter" not in _flags:
    _flags += " --xla_disable_hlo_passes=space-to-batch-converter"
os.environ["XLA_FLAGS"] = _flags.strip()

# jax 0.9 dropped xla_force_host_platform_device_count; virtual devices come
# from the jax_num_cpu_devices config (must be set before backend init).
import jax  # noqa: E402

jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.RandomState(0)
