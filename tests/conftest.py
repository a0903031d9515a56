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

# Persistent compilation cache: the suite's cost is dominated by XLA
# compiles of the big jitted train steps on one CPU core. Identical HLO
# (same trainer/shapes across tests, and across suite runs) loads from disk
# instead of recompiling.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def _cache_entries() -> int:
    try:
        return len(os.listdir(_CACHE_DIR))
    except OSError:
        return 0


_SESSION_START_ENTRIES = _cache_entries()


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    """Suite wall-clock is dominated by XLA compiles; report how many were
    served from the persistent cache so warm-vs-cold discrepancies between
    runs are diagnosable (new entries == compiles that actually ran)."""
    end = _cache_entries()
    new = end - _SESSION_START_ENTRIES
    terminalreporter.write_line(
        f"[jax persistent cache] {_CACHE_DIR}: {end} entries "
        f"({new} compiled this run, {_SESSION_START_ENTRIES} pre-existing)"
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
