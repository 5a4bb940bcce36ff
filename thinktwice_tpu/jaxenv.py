"""Process-level JAX setup shared by every entry script.

The installed TPU plugin (axon) registers itself from sitecustomize and
ignores the ``JAX_PLATFORMS``/cache environment variables, so scripts must
route both through the config API before any backend initialization
(tests/conftest.py does the same for pytest). Call ``setup()`` at import
time, right after ``import jax`` is possible.
"""

from __future__ import annotations

import os


def setup(cache_dir: str = "/root/.cache/jax") -> None:
    import jax

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", cache_dir))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
