"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Mirrors the reference's absent test story with the strategy from
SURVEY.md §4: unit tests on synthetic tensors, multi-chip sharding tests on
``--xla_force_host_platform_device_count=8`` fake devices.  Must run before
the first ``import jax`` anywhere in the test process.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A site-wide PJRT plugin may have force-registered the TPU backend before
# this file runs; pin the platform list to cpu so tests never touch the chip.
jax.config.update("jax_platforms", "cpu")
# The virtual-8-device CPU backend sporadically aborts under concurrent
# dispatch of large sharded executables (observed as silent SIGABRT in
# pjit __call__ / array fetch); synchronous dispatch sidesteps the race.
jax.config.update("jax_cpu_enable_async_dispatch", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
