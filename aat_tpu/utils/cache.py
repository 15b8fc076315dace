"""Persistent XLA compilation cache.

First compiles of the flagship models take tens of minutes on this class of
host; the persistent cache makes every subsequent process reuse them. Safe
to call multiple times; keyed by program + compiler version.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get("AAT_TPU_CACHE_DIR", DEFAULT_CACHE_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception as e:  # noqa: BLE001 — cache is an optimization only
        logger.warning("compilation cache unavailable: %s", e)
