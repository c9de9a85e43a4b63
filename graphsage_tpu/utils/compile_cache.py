"""Persistent XLA compilation cache.

Under the axon relay a cold TPU compile costs 20-40 s per program, and the
framework compiles several (train block, eval, serving buckets). JAX's
persistent cache keys entries by HLO + compile options, so a restarted
process — same presets, same shapes — replays them from disk instead of
recompiling. The reference has no counterpart (torch CPU eager); this is
TPU-deployment plumbing.

Enabled by default in the CLI (``python -m graphsage_tpu.train``,
``--no-compilation-cache`` opts out); library users call :func:`enable`
explicitly — mutating global jax config from library import would be rude.
"""

from __future__ import annotations

import os

_DEFAULT = "~/.cache/graphsage_tpu/xla"


def enable(path: str | None = None, min_compile_seconds: float = 1.0) -> str:
    """Turn on JAX's persistent compilation cache at ``path``.

    ``path`` defaults to ``$GRAPHSAGE_TPU_COMPILE_CACHE`` or
    ``~/.cache/graphsage_tpu/xla``. ``min_compile_seconds`` filters out
    trivially cheap programs (set 0 to cache everything — tests do).
    Idempotent; returns the resolved directory.
    """
    import jax

    path = os.path.expanduser(
        path or os.environ.get("GRAPHSAGE_TPU_COMPILE_CACHE", _DEFAULT)
    )
    os.makedirs(path, exist_ok=True)
    # The process-global cache object latches its directory on first use;
    # reset it so enabling AFTER earlier compilations still takes effect.
    try:
        from jax.experimental.compilation_cache import (
            compilation_cache as _cc,
        )

        _cc.reset_cache()
    except Exception:
        pass
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_seconds)
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
