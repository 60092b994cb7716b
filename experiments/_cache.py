"""Shared experiment helper: enable the JAX persistent compile cache so
re-running an experiment doesn't pay full-size compiles through the tunnel
again (same mechanism as bench.py). Importing this module also puts the
repo root on sys.path so `segmif_tpu` resolves when an experiment is run as
`python experiments/eN_*.py` (Python only adds the script's own dir)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
