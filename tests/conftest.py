"""Test harness: force an 8-device CPU platform so multi-chip sharding
semantics (pjit/GSPMD, cross-replica BN) are exercised without TPUs —
the JAX-native analog of the reference's thread-based fake-distributed
sync BN (``network/backbone/sync_batchnorm/comm.py``)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
