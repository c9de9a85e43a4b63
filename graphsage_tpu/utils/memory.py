"""Measured device-memory accounting.

``NodeShardedFeatures.memory_stats`` reports the *theoretical* ``N/S * F``
bytes per chip; this module measures what is actually resident, so the
sharded-memory claim can be asserted against the machine instead of the
design. The reference has no analog (one process, one resident
``nn.Embedding`` — reference graphsage/model.py:70-71); at pod scale the
difference between "should be N/S" and "is N/S" is exactly a stray
replicated table.

Built on ``jax.live_arrays()``: every live ``jax.Array``'s addressable
shards are device buffers owned by this process. Per-device totals catch
aggregate bloat; the largest-single-buffer view catches the specific
failure mode of a whole ``[N, F]`` table resident on one chip.
"""

from __future__ import annotations

import jax
import numpy as np


def live_device_bytes(min_bytes: int = 0) -> dict:
    """Measured bytes of live device buffers, per device and total.

    ``min_bytes`` filters tiny buffers (scalars, RNG keys) out of the
    per-buffer list; totals always count everything.
    """
    per_device: dict[str, int] = {}
    buffers: list[dict] = []
    for arr in jax.live_arrays():
        try:
            shards = arr.addressable_shards
        except Exception:  # deleted/donated arrays can linger in the registry
            continue
        for sh in shards:
            nbytes = int(np.prod(sh.data.shape)) * sh.data.dtype.itemsize
            dev = str(sh.device)
            per_device[dev] = per_device.get(dev, 0) + nbytes
            if nbytes >= min_bytes:
                buffers.append(
                    {
                        "device": dev,
                        "shape": tuple(sh.data.shape),
                        "dtype": str(sh.data.dtype),
                        "nbytes": nbytes,
                    }
                )
    buffers.sort(key=lambda b: -b["nbytes"])
    return {
        "per_device_bytes": per_device,
        "total_bytes": sum(per_device.values()),
        "largest_buffer_bytes": buffers[0]["nbytes"] if buffers else 0,
        "buffers": buffers,
    }


def max_live_buffer_bytes() -> int:
    """Largest single live device buffer (bytes) owned by this process."""
    return live_device_bytes()["largest_buffer_bytes"]


def assert_no_buffer_at_least(limit_bytes: int, context: str = "") -> None:
    """Raise if any single live device buffer is >= ``limit_bytes``.

    The sharded trainers' memory tests call this with the full-table byte
    count: a pass is machine-level proof that no chip holds a whole
    ``[N, F]`` (or full-adjacency) copy.
    """
    stats = live_device_bytes(min_bytes=limit_bytes)
    offenders = stats["buffers"]
    if offenders:
        desc = ", ".join(
            f"{b['shape']}/{b['dtype']}={b['nbytes']}B on {b['device']}"
            for b in offenders[:5]
        )
        raise AssertionError(
            f"live device buffer(s) >= {limit_bytes} bytes{' (' + context + ')' if context else ''}: {desc}"
        )
