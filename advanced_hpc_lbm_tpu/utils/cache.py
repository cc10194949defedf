"""Persistent XLA compilation cache setup.

The engine's kernels take seconds to minutes to compile (remote Mosaic
compile on some TPU setups); caching compiled executables on disk makes
every CLI/bench rerun of a known deck shape start hot.  Opt-out with
LBM_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    if os.environ.get("LBM_NO_COMPILE_CACHE"):
        return
    import jax

    path = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/advanced_hpc_lbm_tpu/xla"),
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:
        pass  # cache is an optimization; never fail a run over it
