"""Shared experiment helper: enable the JAX persistent compile cache so
re-running an experiment doesn't pay full-size compiles through the tunnel
again (same mechanism as bench.py)."""
import os


def enable():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
