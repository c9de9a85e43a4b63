"""Static-shape graph container for TPU execution.

The reference stores adjacency as ``defaultdict(set)`` and walks it with Python
loops (reference graphsage/model.py:61-62, encoders.py:39). That is unusable
under ``jax.jit``: everything here is a padded, fixed-shape device array so the
whole sample->gather->aggregate->project pipeline traces once and compiles.

Two adjacency views are kept, because different kernels want different layouts:

* **ELL / padded rows** — ``neighbors[N, max_deg]`` + ``degrees[N]``. This is
  what the fixed-fanout sampler consumes (one gather + top-k per frontier).
  Padding slots hold ``0`` and are masked by ``degrees``.
* **CSR** — ``indptr[N+1]`` + flat ``indices[E_pad]`` (+ ``edge_rows[E_pad]``
  as COO rows for segment ops). This feeds full-graph SpMM-style aggregation
  (segment-sum / Pallas kernels) and the edge partitioner.

Features and labels live alongside so a single pytree can be placed/sharded
with one ``jax.device_put``. All metadata that must stay static under tracing
(``num_nodes``, ``max_degree``, ...) is marked as pytree aux data.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class Graph:
    """Immutable padded graph pytree.

    Array fields participate in jit/sharding; ``pytree_node=False`` fields are
    static python ints baked into the compiled program.
    """

    # ELL view (sampler hot path)
    neighbors: jax.Array  # int32 [num_nodes, max_degree], padded with 0
    degrees: jax.Array  # int32 [num_nodes]

    # CSR/COO view (full-graph aggregation, partitioning)
    indptr: jax.Array  # int32 [num_nodes + 1]
    edge_dst: jax.Array  # int32 [num_edges_pad]  (CSR column indices)
    edge_src: jax.Array  # int32 [num_edges_pad]  (COO row per edge)
    edge_mask: jax.Array  # bool  [num_edges_pad]  (False on padding)

    # Node payload
    features: jax.Array  # float [num_nodes, num_features]
    labels: jax.Array  # int32 [num_nodes]

    # Static metadata
    num_nodes: int = struct.field(pytree_node=False)
    num_features: int = struct.field(pytree_node=False)
    num_classes: int = struct.field(pytree_node=False)
    max_degree: int = struct.field(pytree_node=False)
    num_edges: int = struct.field(pytree_node=False)  # directed edge slots in use

    def __repr__(self) -> str:  # keep pytree printing readable
        return (
            f"Graph(N={self.num_nodes}, F={self.num_features}, "
            f"C={self.num_classes}, E={self.num_edges}, max_deg={self.max_degree})"
        )


def adjacency_from_edges(
    num_nodes: int,
    edges: np.ndarray,
    undirected: bool = True,
) -> list[np.ndarray]:
    """Build deduplicated sorted neighbor lists from an edge array [E, 2].

    Matches the reference's semantics: self-loops are kept only if present in
    the input (the reference adds none), duplicates collapse (set semantics,
    reference model.py:61-62), and ``undirected=True`` mirrors every edge.
    """
    edges = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    if undirected and len(edges):
        edges = np.concatenate([edges, edges[:, ::-1]], axis=0)
    # Deduplicate (src, dst) pairs, then split by src.
    if len(edges):
        keys = edges[:, 0] * np.int64(num_nodes) + edges[:, 1]
        _, uniq_idx = np.unique(keys, return_index=True)
        edges = edges[np.sort(uniq_idx)]
        order = np.argsort(edges[:, 0], kind="stable")
        edges = edges[order]
    counts = np.bincount(edges[:, 0], minlength=num_nodes) if len(edges) else np.zeros(
        num_nodes, dtype=np.int64
    )
    splits = np.cumsum(counts)[:-1]
    dsts = edges[:, 1] if len(edges) else np.zeros((0,), dtype=np.int64)
    rows = np.split(dsts, splits)
    return [np.sort(r) for r in rows]


def build_graph(
    features: np.ndarray,
    labels: np.ndarray,
    edges: np.ndarray | Iterable[Sequence[int]],
    num_classes: int | None = None,
    undirected: bool = True,
    max_degree: int | None = None,
    degree_pad_multiple: int = 8,
    edge_pad_multiple: int = 128,
    feature_dtype: jnp.dtype = jnp.float32,
) -> Graph:
    """Construct a :class:`Graph` from host-side numpy data.

    ``max_degree`` caps padded row width; rows longer than the cap keep their
    true degree in CSR form but the ELL view truncates (the sampler then draws
    from the first ``max_degree`` neighbors — only relevant if a cap is forced
    below the true max; by default the cap is the graph's max degree).
    """
    features = np.asarray(features)
    labels = np.asarray(labels).reshape(-1).astype(np.int32)
    num_nodes, num_features = features.shape
    if labels.shape[0] != num_nodes:
        raise ValueError(f"labels ({labels.shape[0]}) != num_nodes ({num_nodes})")
    if num_classes is None:
        num_classes = int(labels.max()) + 1 if num_nodes else 0

    edges = np.asarray(list(edges) if not isinstance(edges, np.ndarray) else edges)
    rows = adjacency_from_edges(num_nodes, edges, undirected=undirected)
    true_degrees = np.array([len(r) for r in rows], dtype=np.int32)

    graph_max_deg = int(true_degrees.max()) if num_nodes else 0
    if max_degree is None:
        max_degree = graph_max_deg
    max_degree = max(_round_up(max(max_degree, 1), degree_pad_multiple), degree_pad_multiple)

    ell = np.zeros((num_nodes, max_degree), dtype=np.int32)
    ell_degrees = np.minimum(true_degrees, max_degree).astype(np.int32)
    for i, r in enumerate(rows):
        d = ell_degrees[i]
        ell[i, :d] = r[:d]

    # CSR over the (possibly truncated) same rows so both views agree.
    indptr = np.zeros(num_nodes + 1, dtype=np.int32)
    np.cumsum(ell_degrees, out=indptr[1:])
    num_edges = int(indptr[-1])
    e_pad = max(_round_up(max(num_edges, 1), edge_pad_multiple), edge_pad_multiple)
    edge_dst = np.zeros(e_pad, dtype=np.int32)
    edge_src = np.zeros(e_pad, dtype=np.int32)
    edge_mask = np.zeros(e_pad, dtype=bool)
    pos = 0
    for i, r in enumerate(rows):
        d = ell_degrees[i]
        edge_dst[pos : pos + d] = r[:d]
        edge_src[pos : pos + d] = i
        pos += d
    edge_mask[:num_edges] = True
    # Padding edges point at node 0 with src num_nodes-1 so segment ops stay in range.
    if num_edges < e_pad and num_nodes:
        edge_src[num_edges:] = num_nodes - 1

    return Graph(
        neighbors=jnp.asarray(ell),
        degrees=jnp.asarray(ell_degrees),
        indptr=jnp.asarray(indptr),
        edge_dst=jnp.asarray(edge_dst),
        edge_src=jnp.asarray(edge_src),
        edge_mask=jnp.asarray(edge_mask),
        features=jnp.asarray(features, dtype=feature_dtype),
        labels=jnp.asarray(labels),
        num_nodes=num_nodes,
        num_features=num_features,
        num_classes=int(num_classes),
        max_degree=max_degree,
        num_edges=num_edges,
    )
