"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference (JirkaKlimes/YOHO) ships zero tests (SURVEY.md §4); this suite is
the from-scratch replacement. Distribution tests follow the standard JAX
pattern of faking devices with ``--xla_force_host_platform_device_count`` so
mesh/shard_map/pjit paths are exercised without TPU hardware.

This must run before anything imports jax, hence module-level env mutation in
conftest (pytest imports conftest first).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The environment may pre-import jax (e.g. a TPU plugin registered from
# sitecustomize), in which case jax captured JAX_PLATFORMS before this file
# ran — override through the live config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
