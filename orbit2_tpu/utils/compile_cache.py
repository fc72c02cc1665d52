"""Persistent XLA compilation cache.

The reference has no equivalent — torch eager pays no compile cost. Here
every train/eval step is one XLA program, and a cold compile of the 1B
trunk costs minutes (remote-compile tunnels make it worse). JAX's
persistent compilation cache keys serialized executables by
(HLO, compile options, backend), so a second run of the SAME config skips
straight to execution. This module wires it behind one call used by the
Trainer, config-exposed as ``trainer.compilation_cache`` and overridable
with ``ORBIT2_COMPILATION_CACHE=/path``.

Safe-by-default: backends whose executables can't be serialized (some PJRT
plugins) make JAX skip caching with a warning rather than fail, and any
error while enabling is logged and swallowed — a broken cache must never
take down a training run.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

log = logging.getLogger("orbit2_tpu")

_ENV_VAR = "ORBIT2_COMPILATION_CACHE"
_enabled_dir: Optional[str] = None


def enable_compilation_cache(cache_dir: str,
                             min_compile_seconds: float = 1.0) -> bool:
    """Point JAX's persistent compilation cache at ``cache_dir`` (created if
    missing). Compilations faster than ``min_compile_seconds`` are not
    persisted (they're cheaper to redo than to deserialize). Returns True if
    the cache is active after the call. Idempotent; a second call with a
    different directory re-points the cache."""
    global _enabled_dir
    try:
        cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_seconds))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled_dir = cache_dir
        log.info("persistent compilation cache at %s (min compile %.1fs)",
                 cache_dir, min_compile_seconds)
        return True
    except Exception as e:  # never let cache wiring kill a run
        log.warning("compilation cache disabled: %s", e)
        _enabled_dir = None
        return False


def maybe_enable_from_config(trainer_cfg) -> Optional[str]:
    """Enable the cache from ``trainer.compilation_cache`` or the
    ORBIT2_COMPILATION_CACHE env var (env wins, matching the samplestore
    flag convention). Returns the active directory or None."""
    path = os.environ.get(_ENV_VAR) or getattr(
        trainer_cfg, "compilation_cache", None)
    if not path:
        return None
    return _enabled_dir if enable_compilation_cache(path) else None


def cache_dir() -> Optional[str]:
    """The directory the cache was last enabled at, or None."""
    return _enabled_dir
