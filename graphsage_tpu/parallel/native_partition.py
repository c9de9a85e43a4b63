"""ctypes bindings to the native partitioner (csrc/partitioner.cpp).

Community-LPA shard assignment and BFS ordering for the halo-exchange plan.
The numpy implementations in :mod:`graphsage_tpu.parallel.halo` remain the
semantics oracle (parity-tested); the native versions replace the numpy
O(E log E) lexsort sweeps with per-node counting passes — the difference
between minutes and seconds at the 20M-edge BASELINE #4 scale. Loading is
lazy and failure falls back to numpy transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "csrc")
_LIB_PATH = os.path.abspath(os.path.join(_CSRC, "libgraphsage_partition.so"))
_lib: Optional[ctypes.CDLL] = None
_lib_error: Optional[str] = None


def load_library(build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_error
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not build:
            return None
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_CSRC)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception as e:
            _lib_error = f"native build failed: {e}"
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        _lib_error = str(e)
        return None
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.gsp_lpa_assign.argtypes = [
        i64p, i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double, i32p,
    ]
    lib.gsp_lpa_assign.restype = ctypes.c_int
    lib.gsp_bfs_order.argtypes = [i64p, i32p, ctypes.c_int64, i32p]
    lib.gsp_bfs_order.restype = ctypes.c_int
    _lib = lib
    return _lib


def _csr_arrays(graph):
    indptr = np.ascontiguousarray(np.asarray(graph.indptr), dtype=np.int64)
    edge_dst = np.ascontiguousarray(
        np.asarray(graph.edge_dst)[: graph.num_edges], dtype=np.int32
    )
    return indptr, edge_dst


def lpa_assign_native(
    graph, num_shards: int, iters: int = 10, slack: float = 1.05
) -> Optional[np.ndarray]:
    """Native LPA shard assignment; None when the library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    indptr, edge_dst = _csr_arrays(graph)
    out = np.empty(graph.num_nodes, dtype=np.int32)
    rc = lib.gsp_lpa_assign(
        indptr, edge_dst, graph.num_nodes, num_shards, iters, slack, out
    )
    return out.astype(np.int64) if rc == 0 else None


def bfs_order_native(graph) -> Optional[np.ndarray]:
    """Native BFS order; None when the library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    indptr, edge_dst = _csr_arrays(graph)
    out = np.empty(graph.num_nodes, dtype=np.int32)
    rc = lib.gsp_bfs_order(indptr, edge_dst, graph.num_nodes, out)
    return out.astype(np.int64) if rc == 0 else None
