"""Halo-exchange (boundary all-to-all) full-graph aggregation.

The simple edge-partitioned path (`parallel/distributed.sharded_spmm_mean`)
psums full ``[N, F]`` partial sums per layer — O(N*F) communication per chip
regardless of partition quality. This module implements the scalable design
from SURVEY.md §5.7 / BASELINE north star: **node-partitioned** shards that
exchange only *boundary* rows:

1. Nodes are split into contiguous ranges balanced by edge count (CSR rows
   are sorted, so each shard's edges are a contiguous block).
2. Host-side precompute (:func:`build_node_partition`): for each shard pair
   (s, t) the set of t-owned rows s's edges reference. These request lists
   are padded to the max boundary size ``M`` and become a static send plan.
3. Per layer (:func:`halo_spmm_mean`, inside ``shard_map``): every shard
   aggregates its *local* edges immediately (they only need resident rows),
   while the boundary rows move in ``halo_chunks`` independent
   ``all_to_all`` chunks, each followed by a segment-sum over just the
   edges that reference that chunk. Every all_to_all depends only on the
   layer input, so XLA's async collective scheduler can keep chunk ``c+1``
   in flight on the ICI while chunk ``c``'s edges aggregate — the
   overlapped boundary exchange the north star asks for. ``halo_chunks=1``
   degenerates to the single-exchange form.

Communication per shard per layer is ``(S-1) * M * F`` instead of ``N * F``;
``M`` is the partition's boundary size (reported by
:func:`NodePartition.comm_stats`). The whole thing is differentiable
(all_to_all and segment-sum have transpose rules), so the same path serves
full-graph distributed training.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from graphsage_tpu.data.graph import Graph
from graphsage_tpu.models.graphsage import GraphSAGE, SAGEParams


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class NodePartition(NamedTuple):
    """Static halo-exchange plan. All arrays are stacked with a leading
    shard dimension and sharded over it; ``send_plan`` is replicated.

    Edges are pre-grouped into ``1 + halo_chunks`` groups: group 0 needs
    only shard-resident rows; group ``1 + c`` references boundary rows in
    exchange chunk ``c`` (its slots index that chunk's receive buffer
    ``[S * chunk_size]``), so each chunk's aggregation can start as soon as
    its own all_to_all lands."""

    num_shards: int
    nodes_per_shard: int  # Np (padded)
    halo_size: int  # M (padded max boundary rows between any pair)
    halo_chunks: int  # C — number of independent exchange chunks
    chunk_size: int  # mc = M / C (M is padded to a multiple of C)
    offsets: jax.Array  # [S] first global node id of each range
    sizes: jax.Array  # [S] true range sizes
    h0: jax.Array  # [S, Np, F] features, zero-padded
    labels: jax.Array  # [S, Np] int32
    node_mask: jax.Array  # [S, Np] bool (True on real nodes)
    edge_row: jax.Array  # [S, 1+C, Eg] local destination row (0..Np)
    edge_slot: jax.Array  # [S, 1+C, Eg] row index (group 0: local; else chunk recv buffer)
    edge_mask: jax.Array  # [S, 1+C, Eg]
    send_plan: jax.Array  # [S_owner, S_dest, M] local row indices to send
    stacked_index: jax.Array  # [N] position of global node v in the stacked layout

    def comm_stats(self) -> dict:
        """Boundary-exchange volume vs the naive psum design."""
        s, np_, m = self.num_shards, self.nodes_per_shard, self.halo_size
        n = int(self.stacked_index.shape[0])
        return {
            "num_shards": s,
            "nodes_per_shard": np_,
            "halo_rows_per_pair": m,
            "rows_exchanged_per_shard": (s - 1) * m,
            "rows_psum_equivalent": n,
            "comm_reduction_vs_psum": n / max((s - 1) * m, 1),
        }


def build_node_partition(
    graph: Graph, num_shards: int, halo_chunks: int = 4
) -> NodePartition:
    """Host-side precompute of the halo-exchange plan (numpy).

    ``halo_chunks`` splits the boundary exchange into independent
    all_to_all chunks whose aggregations interleave (comm/compute overlap);
    it is clamped so chunks never degenerate below 8 rows."""
    indptr = np.asarray(graph.indptr)
    edge_dst = np.asarray(graph.edge_dst)[: graph.num_edges]
    feats = np.asarray(graph.features)
    labels = np.asarray(graph.labels)
    n = graph.num_nodes

    # Contiguous node ranges balanced by edge count.
    target = graph.num_edges / num_shards
    bounds = [0]
    for s in range(1, num_shards):
        # first row whose cumulative edge count reaches s*target
        b = int(np.searchsorted(indptr, s * target, side="left"))
        b = min(max(b, bounds[-1]), n)
        bounds.append(b)
    bounds.append(n)
    offsets = np.array(bounds[:-1], dtype=np.int32)
    sizes = np.diff(bounds).astype(np.int32)

    np_pad = _round_up(max(int(sizes.max()), 1), 8)
    owner_of = np.searchsorted(bounds, np.arange(n), side="right") - 1

    # Per-shard boundary request sets: need[s][t] = sorted t-owned dsts.
    need: list[dict[int, np.ndarray]] = []
    shard_edges = []
    for s in range(num_shards):
        lo, hi = bounds[s], bounds[s + 1]
        e0, e1 = indptr[lo], indptr[hi]
        dst = edge_dst[e0:e1]
        row = np.repeat(
            np.arange(lo, hi), np.diff(indptr[lo : hi + 1])
        ).astype(np.int64)
        shard_edges.append((row - lo, dst))
        owners = owner_of[dst]
        d: dict[int, np.ndarray] = {}
        for t in range(num_shards):
            if t == s:
                continue
            sel = dst[owners == t]
            d[t] = np.unique(sel)
        need.append(d)

    m = max([1] + [len(v) for d in need for v in d.values()])
    chunks = max(1, min(int(halo_chunks), (m + 7) // 8))
    mc = _round_up(-(-m // chunks), 8)  # per-chunk rows, 8-padded
    m = mc * chunks

    # send_plan[t, s] = local indices (u - offset_t) of rows t sends to s.
    send_plan = np.zeros((num_shards, num_shards, m), dtype=np.int32)
    for s in range(num_shards):
        for t, uniq in need[s].items():
            send_plan[t, s, : len(uniq)] = uniq - offsets[t]

    # Group every edge: group 0 = local (slot indexes resident rows), group
    # 1 + c = references exchange chunk c (slot indexes that chunk's receive
    # buffer [S * mc]). Vectorized slot resolution: searchsorted into the
    # (sorted, unique) per-pair request lists — no per-edge Python.
    n_groups = 1 + chunks
    grouped: list[list[tuple[np.ndarray, np.ndarray]]] = []
    for s in range(num_shards):
        rows, dst = shard_edges[s]
        cnt = len(rows)
        owners = owner_of[dst] if cnt else np.zeros(0, dtype=np.int64)
        slots = np.empty(cnt, dtype=np.int32)
        group = np.zeros(cnt, dtype=np.int32)
        local_sel = owners == s
        slots[local_sel] = (dst[local_sel] - offsets[s]).astype(np.int32)
        for t in range(num_shards):
            if t == s:
                continue
            sel = owners == t
            if not sel.any():
                continue
            pos = np.searchsorted(need[s][t], dst[sel])
            c = pos // mc
            group[sel] = 1 + c
            slots[sel] = (t * mc + (pos - c * mc)).astype(np.int32)
        grouped.append(
            [
                (rows[group == g], slots[group == g])
                for g in range(n_groups)
            ]
        )

    ep = _round_up(
        max(
            1,
            max(len(r) for per_shard in grouped for r, _ in per_shard),
        ),
        128,
    )
    edge_row = np.zeros((num_shards, n_groups, ep), dtype=np.int32)
    edge_slot = np.zeros((num_shards, n_groups, ep), dtype=np.int32)
    edge_mask = np.zeros((num_shards, n_groups, ep), dtype=bool)
    for s in range(num_shards):
        for g, (rows_g, slots_g) in enumerate(grouped[s]):
            k = len(rows_g)
            edge_row[s, g, :k] = rows_g
            edge_slot[s, g, :k] = slots_g
            edge_mask[s, g, :k] = True
        # padded edges keep row 0 / slot 0 (masked)

    h0 = np.zeros((num_shards, np_pad, graph.num_features), feats.dtype)
    lab = np.zeros((num_shards, np_pad), np.int32)
    node_mask = np.zeros((num_shards, np_pad), bool)
    stacked_index = np.zeros(n, np.int32)
    for s in range(num_shards):
        sz = sizes[s]
        h0[s, :sz] = feats[bounds[s] : bounds[s + 1]]
        lab[s, :sz] = labels[bounds[s] : bounds[s + 1]]
        node_mask[s, :sz] = True
        stacked_index[bounds[s] : bounds[s + 1]] = s * np_pad + np.arange(sz)

    return NodePartition(
        num_shards=num_shards,
        nodes_per_shard=np_pad,
        halo_size=m,
        halo_chunks=chunks,
        chunk_size=mc,
        offsets=jnp.asarray(offsets),
        sizes=jnp.asarray(sizes),
        h0=jnp.asarray(h0),
        labels=jnp.asarray(lab),
        node_mask=jnp.asarray(node_mask),
        edge_row=jnp.asarray(edge_row),
        edge_slot=jnp.asarray(edge_slot),
        edge_mask=jnp.asarray(edge_mask),
        send_plan=jnp.asarray(send_plan),
        stacked_index=jnp.asarray(stacked_index),
    )


def halo_spmm_mean(
    axis: str,
    part: NodePartition,
    h_local: jax.Array,  # [1, Np, F] — this shard's rows (inside shard_map)
    send_plan_local: jax.Array,  # [1, S, M] — this shard's send plan
    edge_row: jax.Array,  # [1, 1+C, Eg]
    edge_slot: jax.Array,  # [1, 1+C, Eg]
    edge_mask: jax.Array,  # [1, 1+C, Eg]
) -> tuple[jax.Array, jax.Array]:
    """One halo-exchanged mean aggregation step (call inside shard_map).

    Local edges aggregate immediately from resident rows; each of the C
    boundary chunks is an independent all_to_all (dependent only on the
    layer input) followed by a segment-sum over just its edges — XLA's
    async collective scheduler overlaps chunk c+1's exchange with chunk c's
    aggregation. Returns ``(mean [1, Np, F], valid_count [1, Np])``."""
    np_, f = h_local.shape[1], h_local.shape[2]
    s_axis = jax.lax.axis_size(axis)
    mc = part.chunk_size
    h0 = h_local[0]

    def seg(buf, g):
        w = edge_mask[0, g].astype(h_local.dtype)
        per_edge = jnp.take(buf, edge_slot[0, g], axis=0) * w[:, None]
        return (
            jax.ops.segment_sum(per_edge, edge_row[0, g], num_segments=np_),
            jax.ops.segment_sum(w, edge_row[0, g], num_segments=np_),
        )

    summed, count = seg(h0, 0)  # local edges — no communication needed
    for c in range(part.halo_chunks):
        sp = send_plan_local[0][:, c * mc : (c + 1) * mc]  # [S, mc]
        send = jnp.take(h0, sp.reshape(-1), axis=0).reshape(s_axis, mc, f)
        recv = jax.lax.all_to_all(
            send, axis, split_axis=0, concat_axis=0, tiled=False
        )
        # recv[t] = chunk-c rows this shard requested from shard t.
        s_c, c_c = seg(recv.reshape(s_axis * mc, f), 1 + c)
        summed = summed + s_c
        count = count + c_c
    return (summed / jnp.maximum(count, 1.0)[:, None])[None], count[None]


def halo_full_graph_logits(
    model: GraphSAGE,
    params: SAGEParams,
    part: NodePartition,
    mesh: Mesh,
    axis: str = "graph",
) -> jax.Array:
    """Full-graph logits ``[N, C]`` with halo-exchange aggregation.

    Matches :meth:`GraphSAGE.forward_full_graph` allclose (test-pinned)."""
    if model.aggregator != "mean":
        raise NotImplementedError("halo path supports the mean aggregator")

    from graphsage_tpu.models.layers import apply_full_graph_mean_layer

    def shard_fn(h, send_plan, edge_row, edge_slot, edge_mask):
        if model.compute_dtype is not None:
            h = h.astype(model.compute_dtype)

        def spmm(x):
            # Project-first upstream means the boundary all_to_all moves
            # d_out-wide rows instead of d_in-wide.
            return halo_spmm_mean(
                axis, part, x, send_plan, edge_row, edge_slot, edge_mask
            )

        for l in range(model.num_layers):
            h = apply_full_graph_mean_layer(
                params.layers[l], h, spmm,
                concat_self=model.concat_self,
                self_loop=model.self_loop,
                project_first=model.use_project_first(l, h.shape[-1]),
                precision=model.matmul_precision,
            )
        logits = jnp.einsum(
            "snd,dc->snc", h, params.head.astype(h.dtype),
            preferred_element_type=jnp.float32, precision=model.matmul_precision,
        )
        return logits.astype(jnp.float32)

    stacked = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )(part.h0, part.send_plan, part.edge_row, part.edge_slot, part.edge_mask)

    flat = stacked.reshape(part.num_shards * part.nodes_per_shard, -1)
    return jnp.take(flat, part.stacked_index, axis=0)
