"""Persistent XLA compilation cache (compile once per shape across processes)."""

import os

_DONE = False


def enable_compile_cache(path: str = None) -> None:
    """Idempotently point JAX at an on-disk compilation cache."""
    global _DONE
    if _DONE:
        return
    import jax

    path = path or os.environ.get(
        "NADAVCA_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/nadavca_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _DONE = True
