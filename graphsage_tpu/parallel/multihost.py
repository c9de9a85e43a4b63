"""Multi-host runtime initialization.

The reference has no distributed backend at all (SURVEY.md §5.8). This is
the framework's process-group layer: `jax.distributed.initialize` wires the
hosts together; after that, `jax.devices()` spans the pod slice and the same
`Mesh`/`NamedSharding` code paths (parallel/mesh.py, parallel/distributed.py)
run unchanged, with cross-host collectives riding DCN and intra-slice ones
riding ICI.

Single-host (and this sandbox, which exposes one chip through a relay) is the
no-op case — calling :func:`initialize` is always safe.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def _already_initialized() -> bool:
    """Whether the distributed runtime is already wired — WITHOUT touching
    the XLA backend (``jax.process_count()`` would initialize it, defeating
    a later ``jax.distributed.initialize``)."""
    try:
        from jax._src import distributed as _dist

        return _dist.global_state.client is not None
    except Exception:
        return False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize the multi-host runtime (idempotent, no-op single-host).

    Arguments default from the standard env vars
    (``JAX_COORDINATOR_ADDRESS``, ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``)
    or cluster auto-detection (TPU pod metadata) when available.

    Returns a summary dict: process index/count and local/global device
    counts — useful for logging at startup.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    multi = coordinator_address is not None or (num_processes or 0) > 1
    if multi and not _already_initialized():
        # NOTE: must run before anything touches the XLA backend —
        # jax.process_count() itself would initialize it, so idempotence is
        # checked against the distributed client state instead.
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_primary() -> bool:
    """True on the process that should write checkpoints / logs."""
    return jax.process_index() == 0
