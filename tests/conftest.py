"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding is exercised on virtual CPU devices
(`xla_force_host_platform_device_count`) exactly as recommended for testing
pjit/shard_map programs without TPU hardware.
"""

import os

# CENTERNET_TPU_TEST_PLATFORM=tpu runs the suite against the real chip
# (needed for the TPU-only Pallas kernel gates, tests/test_dcn_pallas.py —
# the env var matters because some runtimes pre-import jax, so a plain
# JAX_PLATFORMS export is silently too late).
_platform = os.environ.get("CENTERNET_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if _platform == "cpu" and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated on CPU (the
# dla_34 train/TTA graphs alone cost ~5 min); cache compiled executables
# across test processes/runs (VERDICT round-1 wall-clock item).
#
# The cache dir is keyed on the host's CPU feature flags: XLA:CPU AOT
# artifacts encode the COMPILE machine's ISA features, and loading an
# artifact compiled on a different machine SIGILL/aborts the process
# (observed: cross-machine /tmp cache reuse crashed the suite mid-run).


def _host_cache_suffix():
    try:
        import hashlib

        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    return "generic"


_cache_dir = os.environ.get(
    "CENTERNET_TPU_TEST_CACHE",
    f"/tmp/centernet_tpu_jax_cache_{_host_cache_suffix()}",
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(1234)
