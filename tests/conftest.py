"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Mirrors the reference's absent test story with the strategy from
SURVEY.md §4: unit tests on synthetic tensors, multi-chip sharding tests on
``--xla_force_host_platform_device_count=8`` fake devices.  Must run before
the first ``import jax`` anywhere in the test process.

The container's sitecustomize registers the axon (tunneled TPU) PJRT
plugin into every interpreter at startup; with that plugin initialized
the 8-virtual-device CPU suite aborts sporadically (silent SIGABRT
during buffer fetches — reproducibly gone without the plugin).  The
factory is therefore unregistered below before any backend initializes.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Drop the tunneled-TPU plugin's backend factory entirely: merely pinning
# jax_platforms=cpu still initializes the plugin .so in-process, and its
# background machinery destabilizes the CPU test backend.
from jax._src import xla_bridge  # noqa: E402

xla_bridge._backend_factories.pop("axon", None)

jax.config.update("jax_platforms", "cpu")
# Synchronous dispatch keeps CPU-backend failures attributable to the
# test that caused them.  (The teardown SIGABRT family itself is
# root-fixed by the drain below — verified by 3x async-dispatch repeats
# of the parallel chunk; set ADAS_TEST_ASYNC_DISPATCH=1 to reproduce.)
if os.environ.get("ADAS_TEST_ASYNC_DISPATCH", "0") != "1":
    jax.config.update("jax_cpu_enable_async_dispatch", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_sessionfinish(session, exitstatus):
    """Teardown barrier: explicit backend drain BEFORE interpreter exit
    (the round-1..4 SIGABRT family; see adas_tpu/utils/drain.py) —
    barrier on pending effects, block on every live jax.Array, drop
    executable caches, collect."""
    from adas_tpu.utils.drain import drain_backend

    drain_backend()
