"""Platform selection that actually works in this image.

The axon TPU plugin ignores the `JAX_PLATFORMS` environment variable, and a
hung TPU tunnel blocks *all* backend initialization (even when the CPU
platform would be selected) unless `jax_platforms` is restricted in-process.
Every CLI entry point calls `honor_platform_env()` before touching jax so
that `JAX_PLATFORMS=cpu` / `JAX_PLATFORM_NAME=cpu` reliably pin the host CPU
backend regardless of tunnel health.
"""
from __future__ import annotations

import os


def honor_platform_env() -> None:
    """Apply JAX_PLATFORMS / JAX_PLATFORM_NAME via jax.config (must run
    before any jax backend initialization)."""
    want = os.environ.get("JAX_PLATFORMS") or os.environ.get(
        "JAX_PLATFORM_NAME")
    if not want:
        return
    import jax

    try:
        jax.config.update("jax_platforms", want.lower())
    except Exception:
        pass  # backend already initialized or unknown platform string
