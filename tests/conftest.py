"""Test harness: force an 8-device CPU platform so multi-chip sharding
semantics (pjit/GSPMD, cross-replica BN) are exercised without TPUs —
the JAX-native analog of the reference's thread-based fake-distributed
sync BN (``network/backbone/sync_batchnorm/comm.py``)."""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the TPU tunnel),
# whose per-process claim handshake takes minutes — tests must never touch it.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# pytest plugins (jaxtyping) import jax before this conftest runs, freezing the
# env-derived config defaults — override them on the live config object too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
