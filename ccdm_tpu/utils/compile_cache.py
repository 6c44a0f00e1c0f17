"""Persistent XLA compilation cache for the CLIs.

The reference has no analog (PyTorch eager rebuilds nothing); under XLA every
jitted graph is compiled once per process, and through a remote-dispatch TPU
runtime a flagship train-step compile costs seconds to minutes (PERFNOTES.md:
K=2 multi-step launch compiled ~5 min through the tunnel). Persisting compiled
executables across processes makes restart/resume and repeated evals start in
seconds instead.

Opt out with `compilation_cache: no` in params.yml or CCDM_COMPILE_CACHE=0;
override the location with `compilation_cache_dir` / CCDM_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

LOGGER = logging.getLogger(__name__)

_DEFAULT_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "ccdm_tpu", "xla",
)


def enable_compilation_cache(params: Optional[Dict[str, Any]] = None) -> Optional[str]:
    """Point JAX at a persistent on-disk compilation cache.

    Returns the cache directory, or None when disabled. Safe to call more
    than once and before/after backend initialization (these config keys are
    not frozen by backend init).
    """
    params = params or {}
    env = os.environ.get("CCDM_COMPILE_CACHE")
    enabled = params.get("compilation_cache", True) if env is None else env not in ("0", "no", "false")
    if not enabled:
        return None
    cache_dir = (
        os.environ.get("CCDM_COMPILE_CACHE_DIR")
        or params.get("compilation_cache_dir")
        or _DEFAULT_DIR
    )
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        already = jax.config.jax_compilation_cache_dir
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Only executables that took real compile time are worth the disk IO.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        if already not in (None, cache_dir):
            # jax materialises the persistent-cache singleton lazily on first
            # use and then ignores config-dir changes; reset it so a
            # re-point after compiles have already happened takes effect
            from jax.experimental.compilation_cache import compilation_cache

            compilation_cache.reset_cache()
    except Exception as e:  # pragma: no cover - unwritable cache dir etc.
        LOGGER.warning("compilation cache disabled (%s)", e)
        return None
    LOGGER.info("persistent compilation cache at %s", cache_dir)
    return cache_dir
