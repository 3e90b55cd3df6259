"""Test config: force CPU backend with 8 virtual devices for sharding tests.

jax 0.9 notes (this image):
  * ``xla_force_host_platform_device_count`` in XLA_FLAGS is ignored;
    virtual CPU devices come from the ``jax_num_cpu_devices`` config.
  * Setting ``JAX_PLATFORMS=cpu`` via env makes ``jax_num_cpu_devices``
    ineffective here (the axon sitecustomize interacts with env-based
    platform selection), so both knobs are set via jax.config BEFORE any
    backend initialization.
"""

import os

# XLA-CPU's space-to-batch pass hits an internal CHECK (shape_inference.cc)
# when compiling the fused cooperative train step's conv graph; disable it
# (correctness-neutral: it is a layout optimization).
_flags = os.environ.get("XLA_FLAGS", "")
if "space-to-batch-converter" not in _flags:
    _flags += " --xla_disable_hlo_passes=space-to-batch-converter"
os.environ["XLA_FLAGS"] = _flags.strip()
os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# The suite's wall clock is dominated by XLA-CPU compiles of the fused
# train-step/epoch graphs (identical across runs); the persistent compile
# cache (same one every entry point uses) makes re-runs start warm.
from cooperative_training_and_latent_space_data_augmentation_tpu.utils.cache import (  # noqa: E402
    enable_compilation_cache,
)

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (compile-heavy value-equivalence "
             "cases, ~23 min extra on XLA-CPU); RUN_SLOW=1 works too")


def pytest_collection_modifyitems(config, items):
    """Default `pytest tests/ -x -q` stays under ~8 min (VERDICT r3 #8) by
    skipping the compile-heavy `slow` cases; every slow case is the long
    variant of a path a fast test still covers.  Full suite:
    `RUN_SLOW=1 python -m pytest tests/` (or --runslow)."""
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW", "0") == "1":
        return
    skip = pytest.mark.skip(reason="slow: set RUN_SLOW=1 or --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.RandomState(0)
