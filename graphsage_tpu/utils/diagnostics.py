"""Failure detection for long TPU runs (SURVEY.md §5.3).

The reference's failure story is "crash = stack trace" (single process,
nothing to detect). Production multi-host runs need two mechanisms, both
provided here:

* **Checkpoint-restart** — periodic snapshots + ``--resume``
  (``Trainer.run(checkpoint_every=...)``, utils/checkpoint.py).
* **Fault/hang stack traces** — ``cloud-tpu-diagnostics`` (the collector
  MaxText ships with): inside :func:`diagnose`, faults (SIGSEGV/SIGABRT and
  friends) and periodic hang snapshots dump every Python thread's stack to
  a debug directory, so a wedged collective on one host of a pod is
  attributable after the fact. No-op fallback when the package is absent.

Usage::

    from graphsage_tpu.utils.diagnostics import diagnose
    with diagnose(stack_trace_dir="/tmp/debug"):
        trainer.run(...)

(CLI: ``python -m graphsage_tpu.train --diagnostics-dir /tmp/debug ...``)
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional


@contextlib.contextmanager
def diagnose(
    stack_trace_dir: Optional[str] = None,
    hang_interval_seconds: int = 600,
) -> Iterator[None]:
    """Collect fault + hang stack traces for the enclosed block.

    ``stack_trace_dir`` — where traces land (the collector reads
    TPU_STACKTRACE_PATH... the library writes to /tmp/debugging by
    default when cloud upload is off). ``hang_interval_seconds`` — period
    of the watchdog snapshot (catches hangs, not just faults).
    Falls back to a no-op (with a warning) when cloud-tpu-diagnostics is
    unavailable, so callers need no conditional imports.
    """
    try:
        from cloud_tpu_diagnostics.configuration import (
            debug_configuration,
            stack_trace_configuration,
        )
        from cloud_tpu_diagnostics.src import debug as _debug
    except Exception:
        import warnings

        warnings.warn(
            "cloud-tpu-diagnostics unavailable; failure diagnostics disabled"
        )
        yield
        return

    if stack_trace_dir:
        os.makedirs(stack_trace_dir, exist_ok=True)
        os.environ.setdefault("TPU_STACKTRACE_PATH", stack_trace_dir)
    debug_config = debug_configuration.DebugConfig(
        stack_trace_config=stack_trace_configuration.StackTraceConfig(
            collect_stack_trace=True,
            stack_trace_to_cloud=False,
            stack_trace_interval_seconds=hang_interval_seconds,
        )
    )
    # NOT the library's own context manager: its stop path joins the
    # watchdog thread, which sits in time.sleep(interval) and only checks
    # the exit flag afterwards — exiting would block for up to the full
    # hang interval (600 s default). Setting the flag without the join is
    # safe: the watchdog is a daemon thread and exits on its next wake.
    _debug.start_debugging(debug_config)
    try:
        yield
    finally:
        # Guarded: a library-internal rename must never mask the real
        # exception coming out of the training block.
        try:
            _debug._exit_flag.set()
        except Exception:
            pass
