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
