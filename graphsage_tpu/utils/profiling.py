"""Profiling and throughput accounting.

The reference's only instrumentation is ``time.time()`` around each step
(reference model.py:94-101). Here: a ``jax.profiler`` trace context for
device-level inspection, a step timer that understands async dispatch (host
transfer as the completion barrier — required under remote-relay execution,
where ``block_until_ready`` on donated outputs can return early), and
edges/s accounting helpers used by bench.py and the scaling harness.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with a host-transfer completion barrier."""

    def __init__(self) -> None:
        self.times: list[float] = []
        self._t0: float | None = None

    def __enter__(self) -> "StepTimer":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        pass

    def stop(self, barrier_value=None) -> float:
        """End the current measurement; pass a device array to force sync."""
        if barrier_value is not None:
            np.asarray(barrier_value)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        # First entry usually includes compilation; report steady state.
        steady = self.times[1:] if len(self.times) > 1 else self.times
        return float(np.mean(steady)) if steady else 0.0


def edges_per_second(edges_per_step: int, sec_per_step: float) -> float:
    return edges_per_step / sec_per_step if sec_per_step > 0 else 0.0


def scaling_efficiency(single_chip_eps: float, n_chip_eps: float, n: int) -> float:
    """edges/s scaling efficiency from 1 chip to n chips (BASELINE target ≥0.8)."""
    if single_chip_eps <= 0 or n <= 0:
        return 0.0
    return n_chip_eps / (n * single_chip_eps)
