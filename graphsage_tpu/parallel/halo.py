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

    Edges are pre-grouped: the *local* group needs only shard-resident rows
    and is padded on its own (it usually dominates); boundary edges live in
    ``halo_chunks`` chunk groups whose slots index their own chunk's receive
    buffer ``[S * chunk_sizes[c]]``, so each chunk's aggregation can start
    as soon as its own all_to_all lands. Chunk sizes partition the 8-padded
    boundary exactly (no per-chunk rounding inflation)."""

    num_shards: int
    nodes_per_shard: int  # Np (padded)
    halo_size: int  # M = sum(chunk_sizes) (8-padded max boundary per pair)
    halo_chunks: int  # C — number of independent exchange chunks
    chunk_sizes: tuple  # per-chunk boundary rows (each a multiple of 8)
    offsets: jax.Array  # [S] first global node id of each range
    sizes: jax.Array  # [S] true range sizes
    h0: jax.Array  # [S, Np, F] features, zero-padded
    labels: jax.Array  # [S, Np] int32
    node_mask: jax.Array  # [S, Np] bool (True on real nodes)
    edge_local_row: jax.Array  # [S, E0] local destination row (0..Np)
    edge_local_slot: jax.Array  # [S, E0] resident-row index
    edge_local_mask: jax.Array  # [S, E0]
    edge_halo_row: jax.Array  # [S, C, Eh]
    edge_halo_slot: jax.Array  # [S, C, Eh] index into chunk c's recv buffer
    edge_halo_mask: jax.Array  # [S, C, Eh]
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
    m = _round_up(m, 8)
    q = m // 8
    chunks = max(1, min(int(halo_chunks), q))
    # Partition the q 8-row blocks exactly across chunks — no per-chunk
    # rounding inflation (e.g. m=72, C=4 -> sizes (24, 16, 16, 16), sum 72).
    blocks = [q // chunks + (1 if i < q % chunks else 0) for i in range(chunks)]
    chunk_sizes = tuple(8 * b for b in blocks)
    chunk_starts = np.concatenate([[0], np.cumsum(chunk_sizes)]).astype(np.int64)

    # send_plan[t, s] = local indices (u - offset_t) of rows t sends to s.
    send_plan = np.zeros((num_shards, num_shards, m), dtype=np.int32)
    for s in range(num_shards):
        for t, uniq in need[s].items():
            send_plan[t, s, : len(uniq)] = uniq - offsets[t]

    # Group every edge: local edges (slot indexes resident rows) pad on
    # their own; boundary edges group by exchange chunk, slots indexing the
    # chunk's receive buffer [S * chunk_sizes[c]]. Vectorized slot
    # resolution: searchsorted into the (sorted, unique) per-pair request
    # lists — no per-edge Python.
    local_lists: list[tuple[np.ndarray, np.ndarray]] = []
    halo_lists: list[list[tuple[np.ndarray, np.ndarray]]] = []
    for s in range(num_shards):
        rows, dst = shard_edges[s]
        cnt = len(rows)
        owners = owner_of[dst] if cnt else np.zeros(0, dtype=np.int64)
        slots = np.empty(cnt, dtype=np.int32)
        group = np.full(cnt, -1, dtype=np.int32)  # -1 = local
        local_sel = owners == s
        slots[local_sel] = (dst[local_sel] - offsets[s]).astype(np.int32)
        for t in range(num_shards):
            if t == s:
                continue
            sel = owners == t
            if not sel.any():
                continue
            pos = np.searchsorted(need[s][t], dst[sel])
            c = np.searchsorted(chunk_starts, pos, side="right") - 1
            group[sel] = c
            slots[sel] = (
                t * np.asarray(chunk_sizes)[c] + (pos - chunk_starts[c])
            ).astype(np.int32)
        local_lists.append((rows[group == -1], slots[group == -1]))
        halo_lists.append(
            [(rows[group == c], slots[group == c]) for c in range(chunks)]
        )

    e0 = _round_up(max(1, max(len(r) for r, _ in local_lists)), 128)
    eh = _round_up(
        max(1, max(len(r) for per_shard in halo_lists for r, _ in per_shard)),
        128,
    )
    edge_local_row = np.zeros((num_shards, e0), dtype=np.int32)
    edge_local_slot = np.zeros((num_shards, e0), dtype=np.int32)
    edge_local_mask = np.zeros((num_shards, e0), dtype=bool)
    edge_halo_row = np.zeros((num_shards, chunks, eh), dtype=np.int32)
    edge_halo_slot = np.zeros((num_shards, chunks, eh), dtype=np.int32)
    edge_halo_mask = np.zeros((num_shards, chunks, eh), dtype=bool)
    for s in range(num_shards):
        rows_l, slots_l = local_lists[s]
        k = len(rows_l)
        edge_local_row[s, :k] = rows_l
        edge_local_slot[s, :k] = slots_l
        edge_local_mask[s, :k] = True
        for c, (rows_c, slots_c) in enumerate(halo_lists[s]):
            k = len(rows_c)
            edge_halo_row[s, c, :k] = rows_c
            edge_halo_slot[s, c, :k] = slots_c
            edge_halo_mask[s, c, :k] = True
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
        chunk_sizes=chunk_sizes,
        offsets=jnp.asarray(offsets),
        sizes=jnp.asarray(sizes),
        h0=jnp.asarray(h0),
        labels=jnp.asarray(lab),
        node_mask=jnp.asarray(node_mask),
        edge_local_row=jnp.asarray(edge_local_row),
        edge_local_slot=jnp.asarray(edge_local_slot),
        edge_local_mask=jnp.asarray(edge_local_mask),
        edge_halo_row=jnp.asarray(edge_halo_row),
        edge_halo_slot=jnp.asarray(edge_halo_slot),
        edge_halo_mask=jnp.asarray(edge_halo_mask),
        send_plan=jnp.asarray(send_plan),
        stacked_index=jnp.asarray(stacked_index),
    )


def halo_spmm_mean(
    axis: str,
    part: NodePartition,
    h_local: jax.Array,  # [1, Np, F] — this shard's rows (inside shard_map)
    send_plan_local: jax.Array,  # [1, S, M] — this shard's send plan
    e_local: tuple,  # (row, slot, mask), each [1, E0]
    e_halo: tuple,  # (row, slot, mask), each [1, C, Eh]
) -> tuple[jax.Array, jax.Array]:
    """One halo-exchanged mean aggregation step (call inside shard_map).

    Local edges aggregate immediately from resident rows; each of the C
    boundary chunks is an independent all_to_all (dependent only on the
    layer input) followed by a segment-sum over just its edges — XLA's
    async collective scheduler overlaps chunk c+1's exchange with chunk c's
    aggregation. Returns ``(mean [1, Np, F], valid_count [1, Np])``."""
    np_, f = h_local.shape[1], h_local.shape[2]
    s_axis = jax.lax.axis_size(axis)
    h0 = h_local[0]
    lrow, lslot, lmask = e_local
    hrow, hslot, hmask = e_halo

    def seg(buf, row, slot, mask):
        w = mask.astype(h_local.dtype)
        per_edge = jnp.take(buf, slot, axis=0) * w[:, None]
        return (
            jax.ops.segment_sum(per_edge, row, num_segments=np_),
            jax.ops.segment_sum(w, row, num_segments=np_),
        )

    # Local edges — no communication needed.
    summed, count = seg(h0, lrow[0], lslot[0], lmask[0])
    off = 0
    for c, mc in enumerate(part.chunk_sizes):
        sp = send_plan_local[0][:, off : off + mc]  # [S, mc]
        off += mc
        send = jnp.take(h0, sp.reshape(-1), axis=0).reshape(s_axis, mc, f)
        recv = jax.lax.all_to_all(
            send, axis, split_axis=0, concat_axis=0, tiled=False
        )
        # recv[t] = chunk-c rows this shard requested from shard t.
        s_c, c_c = seg(
            recv.reshape(s_axis * mc, f), hrow[0, c], hslot[0, c], hmask[0, c]
        )
        summed = summed + s_c
        count = count + c_c
    return (summed / jnp.maximum(count, 1.0)[:, None])[None], count[None]


def halo_segment_max(
    axis: str,
    part: NodePartition,
    h_local: jax.Array,  # [1, Np, pd] — this shard's pooled rows
    send_plan_local: jax.Array,  # [1, S, M]
    e_local: tuple,  # (row, slot, mask), each [1, E0]
    e_halo: tuple,  # (row, slot, mask), each [1, C, Eh]
) -> tuple[jax.Array, jax.Array]:
    """Halo-exchanged guarded segment max (the maxpool analog of
    :func:`halo_spmm_mean`): local edges reduce immediately, each boundary
    chunk is an independent all_to_all followed by a per-chunk segment-max
    folded into the running max; a valid count restores guarded zeros.
    Returns ``(max [1, Np, pd], valid_count [1, Np])``."""
    np_, f = h_local.shape[1], h_local.shape[2]
    s_axis = jax.lax.axis_size(axis)
    h0 = h_local[0]
    lrow, lslot, lmask = e_local
    hrow, hslot, hmask = e_halo
    neg = jnp.finfo(h_local.dtype).min

    def seg(buf, row, slot, mask):
        vals = jnp.where(mask[:, None], jnp.take(buf, slot, axis=0), neg)
        return (
            jax.ops.segment_max(vals, row, num_segments=np_),
            jax.ops.segment_sum(
                mask.astype(jnp.int32), row, num_segments=np_
            ),
        )

    maxed, count = seg(h0, lrow[0], lslot[0], lmask[0])
    off = 0
    for c, mc in enumerate(part.chunk_sizes):
        sp = send_plan_local[0][:, off : off + mc]
        off += mc
        send = jnp.take(h0, sp.reshape(-1), axis=0).reshape(s_axis, mc, f)
        recv = jax.lax.all_to_all(
            send, axis, split_axis=0, concat_axis=0, tiled=False
        )
        m_c, c_c = seg(
            recv.reshape(s_axis * mc, f), hrow[0, c], hslot[0, c], hmask[0, c]
        )
        maxed = jnp.maximum(maxed, m_c)
        count = count + c_c
    out = jnp.where((count > 0)[:, None], maxed, jnp.zeros_like(maxed))
    return out[None], count[None]


def halo_full_graph_logits(
    model: GraphSAGE,
    params: SAGEParams,
    part: NodePartition,
    mesh: Mesh,
    axis: str = "graph",
    h0: jax.Array | None = None,
) -> jax.Array:
    """Full-graph logits ``[N, C]`` with halo-exchange aggregation.

    Matches :meth:`GraphSAGE.forward_full_graph` allclose (test-pinned).

    ``h0`` overrides the partition's stacked feature payload — pass it as a
    jit *argument* from training loops: a closed-over ``part.h0`` becomes an
    HLO constant, and XLA then constant-folds the whole first-layer
    aggregation at compile time (minutes-long compiles at 100K+ nodes).
    """
    from graphsage_tpu.models.layers import (
        apply_full_graph_maxpool_layer,
        apply_full_graph_mean_layer,
    )

    def shard_fn(h, send_plan, e_local, e_halo):
        if model.compute_dtype is not None:
            h = h.astype(model.compute_dtype)

        def spmm(x):
            # Project-first upstream means the boundary all_to_all moves
            # d_out-wide rows instead of d_in-wide.
            return halo_spmm_mean(axis, part, x, send_plan, e_local, e_halo)

        def segmax(pooled):
            return halo_segment_max(
                axis, part, pooled, send_plan, e_local, e_halo
            )

        for l in range(model.num_layers):
            if model.aggregator == "mean":
                h = apply_full_graph_mean_layer(
                    params.layers[l], h, spmm,
                    concat_self=model.concat_self,
                    self_loop=model.self_loop,
                    project_first=model.use_project_first(l, h.shape[-1]),
                    precision=model.matmul_precision,
                )
            else:
                h = apply_full_graph_maxpool_layer(
                    params.layers[l], h, segmax,
                    concat_self=model.concat_self,
                    self_loop=model.self_loop,
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
        in_specs=(P(axis), P(axis), (P(axis),) * 3, (P(axis),) * 3),
        out_specs=P(axis),
    )(
        part.h0 if h0 is None else h0,
        part.send_plan,
        (part.edge_local_row, part.edge_local_slot, part.edge_local_mask),
        (part.edge_halo_row, part.edge_halo_slot, part.edge_halo_mask),
    )

    flat = stacked.reshape(part.num_shards * part.nodes_per_shard, -1)
    return jnp.take(flat, part.stacked_index, axis=0)
