"""Graph partitioning for multi-chip execution.

Edge partitioning: the CSR edge list is already sorted by source node
(graphsage_tpu.data.graph builds it that way), so equal contiguous blocks
give each shard a contiguous node range — the cheap locality-preserving
partition. Each shard aggregates its local edges with a segment-sum; partial
sums for boundary nodes (rows whose edges straddle a block boundary) are
combined by the cross-shard reduction in
:mod:`graphsage_tpu.parallel.distributed`.

``partition_stats`` quantifies partition quality (boundary rows per shard) —
the knob SURVEY.md §7.3 item 4 says to watch for scaling efficiency.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from graphsage_tpu.data.graph import Graph


class EdgePartition(NamedTuple):
    """Edge arrays reshaped to [num_shards, edges_per_shard]."""

    edge_src: jax.Array
    edge_dst: jax.Array
    edge_mask: jax.Array

    @property
    def num_shards(self) -> int:
        return self.edge_src.shape[0]


def partition_edges(graph: Graph, num_shards: int) -> EdgePartition:
    """Split the padded edge arrays into ``num_shards`` equal blocks.

    Pads with masked edges so every shard has identical static shape.
    """
    e_pad = graph.edge_src.shape[0]
    per = -(-e_pad // num_shards)  # ceil
    total = per * num_shards
    pad = total - e_pad

    def pad_to(x, fill):
        return jnp.pad(x, (0, pad), constant_values=fill) if pad else x

    src = pad_to(graph.edge_src, graph.num_nodes - 1)
    dst = pad_to(graph.edge_dst, 0)
    mask = pad_to(graph.edge_mask, False)
    return EdgePartition(
        edge_src=src.reshape(num_shards, per),
        edge_dst=dst.reshape(num_shards, per),
        edge_mask=mask.reshape(num_shards, per),
    )


def partition_stats(graph: Graph, num_shards: int) -> dict:
    """Host-side partition quality report.

    ``boundary_partials`` counts every extra (row, shard) partial beyond the
    first: a row whose CSR edge range spans ``k`` blocks contributes ``k-1``
    (the number of cross-shard partial sums the reduction must merge).
    Vectorized — the edge blocks are contiguous, so a row's span is fully
    determined by the block of its first and last edge."""
    part = partition_edges(graph, num_shards)
    mask = np.asarray(part.edge_mask)
    per = part.edge_src.shape[1]
    indptr = np.asarray(graph.indptr).astype(np.int64)
    deg = indptr[1:] - indptr[:-1]
    nz = deg > 0
    first_block = indptr[:-1][nz] // per
    last_block = (indptr[1:][nz] - 1) // per
    spans = last_block - first_block
    edges_per_shard = mask.sum(axis=1)
    return {
        "num_shards": num_shards,
        "edges_per_shard_min": int(edges_per_shard.min()),
        "edges_per_shard_max": int(edges_per_shard.max()),
        # rows touching >1 block (any straddle, multi-block hubs included)
        "boundary_rows": int((spans > 0).sum()),
        # total extra partials the cross-shard reduction merges
        "boundary_partials": int(spans.sum()),
    }
