"""Test configuration: force a virtual 8-device CPU platform.

Mirrors the reference's CPU-first test strategy (SURVEY.md §4) and gives every
test an 8-device mesh to exercise pjit sharding without TPU hardware. Must run
before jax initializes, hence env vars at import time.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # tests are CPU-first; bench.py uses the real chip
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent XLA compilation cache, shared with every subprocess the
# integration tests spawn (env vars inherit): XLA CPU compiles dominate the
# suite's wall time on this 1-core box, and re-runs hit the cache instead.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".xla_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.3")
# (0.3 not the default 1.0: the suite is hundreds of ~1 s CPU compiles; the
# lower floor made a warm re-run of test_fused_ops 24% faster, measured)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's sitecustomize force-registers the 'axon' TPU backend and
# overrides jax_platforms programmatically; reset it before any backend init.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture()
def rng():
    return np.random.RandomState(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test (CLI subprocesses)"
    )
