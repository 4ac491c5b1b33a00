"""Test harness setup: force an 8-device virtual CPU mesh.

Must run before the first ``import jax`` anywhere in the test process
(SURVEY.md §4 item 4): tests exercise the data-parallel path without TPU
hardware by splitting the host CPU into 8 XLA devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep RNG values identical across shardings (default in recent JAX; pin it).
os.environ.setdefault("JAX_THREEFRY_PARTITIONABLE", "1")

# This machine's sitecustomize imports jax at interpreter startup and
# registers the experimental TPU-tunnel ("axon") backend, so the env var
# alone is too late — force the platform through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
