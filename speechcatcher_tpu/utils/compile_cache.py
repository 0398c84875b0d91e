"""Persistent XLA compilation cache.

First-compile latency through the TPU compile service is hundreds of seconds
for the larger serving programs; the on-disk cache makes server restarts and
repeated benchmark runs start hot.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

logger = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = Path("~/.cache/speechcatcher_tpu/jax_cache").expanduser()


def enable_compile_cache(cache_dir: Path = DEFAULT_CACHE_DIR) -> None:
    import jax

    try:
        cache_dir = Path(cache_dir).expanduser()
        cache_dir.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # unsupported jax version/backend — non-fatal
        logger.warning("compilation cache unavailable: %s", e)
