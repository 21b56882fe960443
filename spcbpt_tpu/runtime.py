"""Runtime/process setup helpers."""
from __future__ import annotations

import os


def setup(cache_dir: str | None = None) -> None:
    """Enable the persistent XLA compilation cache (render-step graphs are
    large; recompiles cost minutes on remote-compile TPU setups)."""
    import jax
    if cache_dir is None:
        cache_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
