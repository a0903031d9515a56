"""JAX platform selection that works when jax is pre-imported.

This image's interpreter pre-imports jax in a template process carrying
the ambient environment (``JAX_PLATFORMS=axon``, the remote-TPU tunnel),
so setting ``JAX_PLATFORMS`` on the command line no longer reaches jax's
import-time config default — the variable IS visible in ``os.environ``
but jax already resolved its platform list. As long as no device has
been touched yet, ``jax.config.update("jax_platforms", ...)`` still
re-routes the backend; once any computation/device query runs, the
backend is locked.

Every CLI entry point calls :func:`honor_env_platform` first thing, so

    env JAX_PLATFORMS=cpu python infer.py ...

behaves as documented (the verify recipe and CI drives depend on it).
"""

from __future__ import annotations

import os


def honor_env_platform(explicit: str | None = None) -> str | None:
    """Apply ``explicit`` (e.g. a ``--platform`` flag) or the
    ``JAX_PLATFORMS`` env var via ``jax.config``. Call before any device
    use. Returns the platform applied (or None if neither was set)."""
    want = explicit or os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        jax.config.update("jax_platforms", want)
    return want


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Persistent XLA compilation cache for the CLI entry points.

    Restart-on-crash training supervisors (the axon client H2D leak makes
    long feeds restart, CLAUDE.md) and serving warmups re-load serialized
    executables instead of recompiling — full-size graphs cost minutes per
    compile on remote-attached TPUs. Default location
    ``~/.cache/msmctts_tpu/jax``; override with ``MSMCTTS_COMPILE_CACHE=
    <dir>``; disable with ``MSMCTTS_COMPILE_CACHE=0``. Call before the
    first compile."""
    env = os.environ.get("MSMCTTS_COMPILE_CACHE", "")
    if env == "0":
        return None
    path = path or env or os.path.expanduser("~/.cache/msmctts_tpu/jax")
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
    except (OSError, AttributeError):  # read-only fs / very old jax
        return None
    return path
