"""Runtime setup shared by all entry points: persistent XLA compilation
cache (first demo run compiles ~20 programs over the remote tunnel;
subsequent runs start in seconds) and sane defaults."""

from __future__ import annotations

import os


def setup_runtime(cache_dir: str = "/root/.cache/jax_cc"):
    import jax

    # LGU_PLATFORM=cpu forces the host backend (dev machines / CI).  The
    # image preloads jax with the TPU plugin via sitecustomize, so env
    # vars are consumed before entry points run — only jax.config works.
    plat = os.environ.get("LGU_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    return jax
