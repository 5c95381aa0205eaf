"""Test config: run all tests on a virtual 8-device CPU mesh so multi-chip
sharding logic is exercised without TPU hardware (the survey's recommended
strategy, SURVEY.md §4)."""
import os

# Force CPU: the container env pins JAX_PLATFORMS=axon (remote TPU relay),
# which serializes python processes and is wrong for unit tests.  Also drop
# the remote-compile routing so CPU compiles stay local.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# NOTE: do NOT enable the persistent XLA compilation cache for CPU tests —
# XLA:CPU AOT results embed host machine features and the fleet machines
# differ (loading mismatched AOT code risks SIGILL; observed as
# "+prefer-no-gather is not supported on the host machine").


@pytest.fixture
def rng():
    return np.random.RandomState(0)
