"""Platform selection that works when jax is pre-imported.

Some environments pre-import jax at interpreter startup with their own
platform plugin, which consumes JAX_PLATFORMS before user code (or even a
process-level env var) can take effect. ``jax.config.update("jax_platforms",
...)`` still works after import as long as no backend has been initialized,
so every CLI entry point calls :func:`enforce_platform_from_env` first.
"""
from __future__ import annotations

import os


def enforce_platform_from_env(default: str = None) -> str:
    """Apply S2D_PLATFORM (or ``default``) through jax.config.

    Returns the platform string applied, or "" if left as-is. Must be called
    before any jax computation (backend init) in the process.
    """
    want = os.environ.get("S2D_PLATFORM", default or "")
    if not want:
        return ""
    import jax

    jax.config.update("jax_platforms", want)
    return want
