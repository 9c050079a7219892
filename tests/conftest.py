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

# The suite is compile-bound (single-core CPU image). Two mitigations:
# a persistent compilation cache (best-effort; XLA:CPU only serializes some
# executables) and, unless NO_FAST_COMPILE is set, skipping most XLA
# optimization passes — tests assert numerics, not performance, and the
# golden values hold without the optimizer (pure f32 math either way).
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_compile_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # older jax without some knobs — cache is best-effort
    pass
if not os.environ.get("NO_FAST_COMPILE"):
    jax.config.update("jax_disable_most_optimizations", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
