"""Persistent XLA compilation cache setup.

On this machine TPU compiles go through a remote compile helper and a cold
full-model compile takes ~15-20 minutes; the persistent cache brings repeat
runs (bench, eval, the driver's compile checks) down to seconds. Safe to
call multiply; no-op if the config is unavailable.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get("CNMNET_JAX_CACHE", _DEFAULT)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax or read-only fs: continue uncached
