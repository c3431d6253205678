"""Persistent XLA compilation cache.

First compiles on TPU cost tens of seconds to minutes; enabling JAX's
persistent cache makes every entry point (CLI, server, bench, training)
warm-start across processes. Called by the CLIs/server/bench at startup —
importing a library module never mutates global config.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/verbatim_rag_tpu/jax")


def pin_platform_from_env() -> None:
    """Honor ``VERBATIM_FORCE_PLATFORM`` before any device init.

    Plugin backends (e.g. a tunneled TPU) override the plain JAX_PLATFORMS
    env var, so an in-process config update is the only reliable pin. Must
    run before the first jax device touch; a no-op when the var is unset.
    """
    platform = os.environ.get("VERBATIM_FORCE_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def enable_persistent_compilation_cache(cache_dir: str | None = None) -> None:
    """Idempotent; respects an externally-set JAX_COMPILATION_CACHE_DIR."""
    import jax

    cache_dir = (
        cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR") or DEFAULT_CACHE_DIR
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Persist even quick compiles: on the tunneled backend a "0.4 s"
        # compile still costs a round-trip per run, and ingest dispatches
        # dozens of small per-shape programs (concats, flush writes) that the
        # 1.0 s default silently excluded — they re-compiled on every run.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        logger.info("JAX persistent compilation cache: %s", cache_dir)
    except Exception as exc:  # never fail startup over a cache
        logger.warning("Could not enable compilation cache: %s", exc)
