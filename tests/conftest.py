"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags BEFORE jax initializes, so this sits in conftest and
is imported first by pytest. Multi-device sharding tests then use
``jax.devices()`` (8 CPU devices) without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# jax is pre-imported by the interpreter in this image, so the env var above
# was read too late — force the platform through the config API as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
