"""Persistent XLA compilation cache (compile once per shape across processes).

Scoped to TPU processes only: remote TPU compiles cost tens of seconds per
executable through the tunnel and dominate small-run wall time, so caching
them is the whole point. CPU compiles take seconds — and reloading CPU AOT
results across runs has bitten for real: XLA's machine-feature check can
reject (or worse, wedge) an entry whose recorded target features don't match
the executing host's (observed 2026-08-21: cached cpu executables with
``+prefer-no-scatter`` hung ``np.asarray`` indefinitely on this host). A
cpu-only process therefore gets no persistent cache.
"""

import os

_DONE = False


def enable_compile_cache(path: str = None) -> None:
    """Idempotently point JAX at an on-disk compilation cache (TPU only)."""
    global _DONE
    if _DONE:
        return
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        _DONE = True
        return
    import jax

    path = path or os.environ.get(
        "NADAVCA_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/nadavca_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # 5 s floor keeps the in-process CPU helpers (joint rescore, host-side
    # jits) out of the cache while every remote TPU compile still qualifies
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    _DONE = True
