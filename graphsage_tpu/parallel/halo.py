"""Halo-exchange (boundary collective) full-graph aggregation.

The simple edge-partitioned path (`parallel/distributed.sharded_spmm_mean`)
psums full ``[N, F]`` partial sums per chip — O(N*F) communication per layer
regardless of partition quality. This module implements the scalable design
from SURVEY.md §5.7 / BASELINE north star: **node-partitioned** shards that
exchange only *boundary* rows, with three independent levers for the
exchange volume (all host-precomputed into a static plan):

1. **Node order** (``order=``): shards own contiguous slices of an internal
   node order balanced by edge count. ``bfs_order`` groups neighborhoods so
   fewer edges cross shards on graphs with locality; the default input
   order is the round-1 behavior.
2. **Hub replication** (``hub_threshold=``): rows referenced by almost
   every shard (power-law hubs) would otherwise appear in *every* pairwise
   request list and inflate them all. Instead each shard contributes its
   owned hubs to one ``all_gather`` per layer — each hub row crosses each
   ICI link once instead of up to S-1 times.
3. **Per-offset sizing** (``sizing="per_offset"``): the boundary exchange
   runs as S-1 ``ppermute`` rounds (receiver ``s`` gets from owner
   ``(s+o) % S`` in round ``o``), each sized to its own worst pair,
   instead of ``halo_chunks`` ``all_to_all`` rounds all padded to the
   single global worst pair. One hub-heavy pair then inflates one round,
   not all of them. The default ``"global"`` keeps the round-1 chunked
   all_to_all (whose chunks overlap compute the same way the rounds do).

Every round (hub all_gather, all_to_all chunk, ppermute offset) depends
only on the layer input, so XLA's async collective scheduler can keep round
``r+1`` in flight on the ICI while round ``r``'s edges aggregate. The
whole exchange is differentiable (all_gather/all_to_all/ppermute and
segment ops have transpose rules), and one generic reduction serves both
aggregators: ``op="sum"`` (mean) and ``op="max"`` (pooling, guarded
empty rows — quirk Q4).

``NodePartition.comm_stats`` reports the per-shard exchange volume; the
quality levers are test-pinned to reduce it on the power-law graph with
logits unchanged (tests/test_halo.py).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from graphsage_tpu.data.graph import Graph
from graphsage_tpu.models.graphsage import GraphSAGE, SAGEParams


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class OffsetRound(NamedTuple):
    """One ppermute boundary round (per-offset sizing). Arrays lead with the
    shard dim; ``size`` is this round's own 8-padded worst pair."""

    offset: int
    size: int
    send: jax.Array  # [S, size] local row ids shard t sends to (t-offset)%S
    edge_row: jax.Array  # [S, E_o] destination rows
    edge_slot: jax.Array  # [S, E_o] index into this round's [size] recv buffer
    edge_mask: jax.Array  # [S, E_o]


class NodePartition(NamedTuple):
    """Static halo-exchange plan. All arrays are stacked with a leading
    shard dimension and sharded over it; ``send_plan`` is replicated.

    Edges are pre-grouped: *local* (shard-resident rows), optional *hub*
    (slots into the all-gathered hub buffer), and *boundary* — either
    ``halo_chunks`` all_to_all chunk groups (``sizing="global"``) or
    per-offset ppermute rounds (``rounds``)."""

    num_shards: int
    nodes_per_shard: int  # Np (padded)
    halo_size: int  # pairwise rows: global m, or sum of per-offset sizes
    halo_chunks: int  # C — all_to_all chunks (global sizing)
    chunk_sizes: tuple  # per-chunk boundary rows (global sizing; 8-padded)
    sizes: jax.Array  # [S] true range sizes
    node_order: jax.Array  # [N] global id at each stacked position
    h0: jax.Array  # [S, Np, F] features in stacked order, zero-padded
    labels: jax.Array  # [S, Np] int32
    node_mask: jax.Array  # [S, Np] bool (True on real nodes)
    edge_local_row: jax.Array  # [S, E0] local destination row (0..Np)
    edge_local_slot: jax.Array  # [S, E0] resident-row index
    edge_local_mask: jax.Array  # [S, E0]
    edge_halo_row: jax.Array  # [S, C, Eh] (global sizing; empty otherwise)
    edge_halo_slot: jax.Array  # [S, C, Eh] index into chunk c's recv buffer
    edge_halo_mask: jax.Array  # [S, C, Eh]
    send_plan: jax.Array  # [S_owner, S_dest, M] local row ids (global sizing)
    stacked_index: jax.Array  # [N] position of global node v in stacked layout
    rounds: Optional[tuple] = None  # tuple[OffsetRound] (per-offset sizing)
    hub_k: int = 0  # hub rows per shard (8-padded max; 0 = no hub lever)
    hub_send: Optional[jax.Array] = None  # [S, hub_k] local row ids
    edge_hub_row: Optional[jax.Array] = None  # [S, Eh2]
    edge_hub_slot: Optional[jax.Array] = None  # [S, Eh2] into [S*hub_k]
    edge_hub_mask: Optional[jax.Array] = None  # [S, Eh2]

    def comm_stats(self) -> dict:
        """Boundary-exchange volume vs the naive psum design."""
        s, np_ = self.num_shards, self.nodes_per_shard
        n = int(self.stacked_index.shape[0])
        if self.rounds is not None:
            pairwise = sum(r.size for r in self.rounds)
        else:
            pairwise = (s - 1) * self.halo_size
        hub = (s - 1) * self.hub_k  # all_gather: each hub row crosses once
        total = pairwise + hub
        return {
            "num_shards": s,
            "nodes_per_shard": np_,
            "halo_rows_per_pair": self.halo_size,
            "hub_rows_per_shard": self.hub_k,
            "rows_exchanged_per_shard": total,
            "rows_psum_equivalent": n,
            "comm_reduction_vs_psum": n / max(total, 1),
        }


def bfs_order(graph: Graph) -> np.ndarray:
    """Breadth-first node order (per-level vectorized; one numpy pass per
    BFS level). Contiguous slices of this order keep neighborhoods together,
    shrinking cross-shard request lists on graphs with locality."""
    indptr = np.asarray(graph.indptr).astype(np.int64)
    edge_dst = np.asarray(graph.edge_dst)[: graph.num_edges]
    n = graph.num_nodes
    deg = indptr[1:] - indptr[:-1]
    visited = np.zeros(n, dtype=bool)
    out = np.empty(n, dtype=np.int64)
    pos = 0
    next_seed = 0
    while pos < n:
        while next_seed < n and visited[next_seed]:
            next_seed += 1
        frontier = np.array([next_seed], dtype=np.int64)
        visited[next_seed] = True
        while len(frontier):
            out[pos : pos + len(frontier)] = frontier
            pos += len(frontier)
            counts = deg[frontier]
            total = int(counts.sum())
            if not total:
                break
            within = np.arange(total) - np.repeat(
                np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
            )
            neigh = edge_dst[np.repeat(indptr[frontier], counts) + within]
            fresh = np.unique(neigh[~visited[neigh]])
            visited[fresh] = True
            frontier = fresh
    return out


def lpa_assign(
    graph: Graph,
    num_shards: int,
    iters: int = 10,
    slack: float = 1.05,
) -> np.ndarray:
    """Community-detection label propagation + balanced packing.

    Phase 1 (vectorized numpy, O(E log E)/iter): every node starts as its
    own community and repeatedly adopts the most frequent community among
    its neighbors — on graphs with any homophily/locality this converges to
    the underlying communities in a handful of sweeps. Phase 2: communities
    are packed largest-first into the least-loaded shard (edge-count
    balanced, ``slack`` headroom); oversized communities are split by
    cumulative degree. Cutting between communities instead of through them
    is what shrinks the pairwise boundary lists — measured 77K -> 33K
    rows/shard on the homophilous 100K power-law with per-offset sizing
    (tests/test_halo.py pins the reduction).

    Returns the [N] shard id per node; ``build_node_partition(order="lpa")``
    uses the groups directly as shards.
    """
    indptr = np.asarray(graph.indptr).astype(np.int64)
    edge_dst = np.asarray(graph.edge_dst)[: graph.num_edges].astype(np.int64)
    edge_src = np.asarray(graph.edge_src)[: graph.num_edges].astype(np.int64)
    n = graph.num_nodes
    degrees = (indptr[1:] - indptr[:-1]).astype(np.int64)

    # Phase 1: plain LPA to find communities (mode of neighbor labels).
    lab = np.arange(n, dtype=np.int64)
    for _ in range(iters):
        l = lab[edge_dst]
        order = np.lexsort((l, edge_src))
        s_s, l_s = edge_src[order], l[order]
        new_run = np.empty(len(order), bool)
        if len(order):
            new_run[0] = True
            np.logical_or(
                s_s[1:] != s_s[:-1], l_s[1:] != l_s[:-1], out=new_run[1:]
            )
        run_id = np.cumsum(new_run) - 1
        run_count = np.bincount(run_id)
        run_src, run_lab = s_s[new_run], l_s[new_run]
        ro = np.lexsort((run_count, run_src))
        rs = run_src[ro]
        last = np.empty(len(rs), bool)
        if len(rs):
            last[-1] = True
            np.not_equal(rs[1:], rs[:-1], out=last[:-1])
        new_lab = lab.copy()
        new_lab[rs[last]] = run_lab[ro][last]
        changed = int((new_lab != lab).sum())
        lab = new_lab
        if changed < max(1, n // 1000):
            break

    # Phase 2: pack communities into shards, balanced by edge count.
    _, comm_inv = np.unique(lab, return_inverse=True)
    comm_edges = np.bincount(comm_inv, weights=degrees)
    cap = slack * max(graph.num_edges, 1) / num_shards
    shard_load = np.zeros(num_shards)
    assign = np.empty(n, np.int64)
    node_order = np.argsort(comm_inv, kind="stable")
    starts = np.concatenate([[0], np.cumsum(np.bincount(comm_inv))]).astype(
        np.int64
    )
    for c in np.argsort(-comm_edges, kind="stable"):
        nodes = node_order[starts[c] : starts[c + 1]]
        w = comm_edges[c]
        if w <= max(cap - shard_load.min(), cap * 0.5):
            t = int(np.argmin(shard_load))
            assign[nodes] = t
            shard_load[t] += w
        else:
            # Split an oversized community by cumulative degree.
            cw = np.cumsum(degrees[nodes])
            pos = 0
            while pos < len(nodes):
                t = int(np.argmin(shard_load))
                room = max(cap - shard_load[t], cap * 0.1)
                prev = cw[pos - 1] if pos else 0
                end = max(int(np.searchsorted(cw, prev + room)), pos + 1)
                assign[nodes[pos:end]] = t
                shard_load[t] += degrees[nodes[pos:end]].sum()
                pos = end
    return assign


def _resolve_order(
    graph: Graph, num_shards: int, order: np.ndarray | str | None
) -> tuple[np.ndarray, list[int] | None]:
    """``(order array, lpa bounds or None)`` for an order spec
    (``None``/``"input"``, ``"bfs"``, ``"lpa"``, or an explicit
    permutation). Shared by :func:`build_node_partition` and the auto
    lever evaluator so both rank the same candidates."""
    n = graph.num_nodes
    if order is None or (isinstance(order, str) and order == "input"):
        return np.arange(n, dtype=np.int64), None
    if isinstance(order, str) and order == "bfs":
        from graphsage_tpu.parallel import native_partition

        nat = native_partition.bfs_order_native(graph)
        return (nat if nat is not None else bfs_order(graph)), None
    if isinstance(order, str) and order == "lpa":
        # Shards = the LPA groups themselves (assignment-aligned bounds),
        # not an edge-balanced re-split that would cut across communities.
        # Native C++ LPA when available (csrc/partitioner.cpp — identical
        # semantics, parity-tested); numpy oracle otherwise.
        from graphsage_tpu.parallel import native_partition

        assign = native_partition.lpa_assign_native(graph, num_shards)
        if assign is None:
            assign = lpa_assign(graph, num_shards)
        order = np.argsort(assign, kind="stable")
        counts = np.bincount(assign, minlength=num_shards)
        return order, [0] + list(np.cumsum(counts).astype(int))
    order = np.asarray(order, dtype=np.int64)
    if len(order) != n or len(np.unique(order)) != n:
        raise ValueError("order must be a permutation of all node ids")
    return order, None


def locality_relabel(
    graph: Graph, num_groups: int, order: str | np.ndarray = "auto"
) -> tuple[Graph, np.ndarray]:
    """Permute node IDS by a locality order (LPA communities, BFS, or an
    explicit permutation) — ``(relabeled graph, perm[old]=new)``.

    Every id-range ownership rule becomes structure-aware after this one
    host-side preprocessing step: ``shard_features`` node ranges,
    ``bounds="equal_nodes"`` halo plans (the sharded layer-0 table build),
    and the distributed sampler's owner routing all see community-aligned
    shards without giving up the contiguous-range arithmetic they rely
    on. The halo FullGraphTrainer does not need this (its plan reorders
    internally via ``order=``); the node-sharded trainers do, because
    their exchanges derive owners from ``id // rows``.

    ``order="auto"`` (default) ranks {input, bfs, lpa} by the cheap
    equal-node-bounds evaluator (:func:`partition_comm_rows`) and keeps
    the winner — ties within 2% break toward the simplest, and when input
    order already wins (id-local generators, preferential attachment) the
    graph is returned UNCHANGED with the identity perm: relabeling, like
    every other lever here, must degrade cleanly on graphs it can't help."""
    from graphsage_tpu.data.graph import relabel_graph

    if isinstance(order, str) and order == "auto":
        ranked = []
        for i, o in enumerate(("input", "bfs", "lpa")):
            stats = partition_comm_rows(
                graph, num_groups, order=o, bounds="equal_nodes"
            )
            ranked.append((stats["rows_exchanged_per_shard"], i, o))
        best_rows = min(r for r, _, _ in ranked)
        order = min(
            (c for c in ranked if c[0] <= best_rows * 1.02),
            key=lambda c: c[1],
        )[2]
        if order == "input":
            return graph, np.arange(graph.num_nodes, dtype=np.int64)
    order_arr, _ = _resolve_order(graph, num_groups, order)
    return relabel_graph(graph, order_arr)


def _edge_balanced_bounds(
    graph: Graph, order: np.ndarray, num_shards: int
) -> list[int]:
    """Contiguous position ranges over ``order`` balanced by edge count."""
    n = graph.num_nodes
    indptr = np.asarray(graph.indptr).astype(np.int64)
    degrees = indptr[1:] - indptr[:-1]
    deg_in_order = degrees[order]
    cum = np.concatenate([[0], np.cumsum(deg_in_order)])
    target = graph.num_edges / num_shards
    bounds = [0]
    for s in range(1, num_shards):
        b = int(np.searchsorted(cum, s * target, side="left"))
        bounds.append(min(max(b, bounds[-1]), n))
    bounds.append(n)
    return bounds


def partition_comm_rows(
    graph: Graph,
    num_shards: int,
    order: np.ndarray | str | None = None,
    sizing: str = "global",
    hub_threshold: int | None = None,
    _resolved: tuple | None = None,
    bounds: str = "edges",
) -> dict:
    """Cheap host-side estimate of a candidate partition's per-shard
    boundary-exchange volume — the same count ``NodePartition.comm_stats``
    reports, without building any device arrays (one O(E log E) pass).
    Feeds :func:`auto_partition_plan`, which passes ``_resolved`` (the
    ``(order array, lpa bounds)`` pair) so BFS/LPA run once per order
    string instead of once per hub x sizing candidate.

    ``bounds="equal_nodes"`` evaluates fixed equal-node POSITION ranges
    instead of edge-balanced ones — i.e. what the plan would cost after
    :func:`locality_relabel` to ``order`` (id-range ownership)."""
    n = graph.num_nodes
    s_num = num_shards
    indptr = np.asarray(graph.indptr).astype(np.int64)
    degrees = indptr[1:] - indptr[:-1]
    edge_dst = np.asarray(graph.edge_dst)[: graph.num_edges].astype(np.int64)
    edge_src = np.asarray(graph.edge_src)[: graph.num_edges].astype(np.int64)

    order_arr, lpa_bounds = (
        _resolved
        if _resolved is not None
        else _resolve_order(graph, num_shards, order)
    )
    if bounds == "equal_nodes":
        rows = _round_up(max(-(-n // num_shards), 1), 8)
        bounds = np.minimum(np.arange(num_shards + 1) * rows, n)
    elif lpa_bounds is not None:
        bounds = lpa_bounds
    else:
        bounds = _edge_balanced_bounds(graph, order_arr, num_shards)
    pos_of = np.empty(n, dtype=np.int64)
    pos_of[order_arr] = np.arange(n)
    owner_of_pos = np.searchsorted(bounds, np.arange(n), side="right") - 1
    owner_of = owner_of_pos[pos_of]

    hub_k = 0
    is_hub = np.zeros(n, dtype=bool)
    if hub_threshold is not None:
        is_hub = degrees >= int(hub_threshold)
        if is_hub.any():
            per_shard = np.bincount(owner_of[is_hub], minlength=s_num)
            hub_k = _round_up(int(per_shard.max()), 8)

    src_o = owner_of[edge_src]
    dst_o = owner_of[edge_dst]
    bmask = (src_o != dst_o) & ~is_hub[edge_dst]
    # Unique (requesting shard, dst node) pairs -> per-(s, t) request counts.
    keys = src_o[bmask] * np.int64(n) + edge_dst[bmask]
    uniq = np.unique(keys)
    us = uniq // n
    ud = owner_of[uniq - us * n]
    cnt = np.bincount(us * s_num + ud, minlength=s_num * s_num).reshape(
        s_num, s_num
    )
    if sizing == "global":
        m = _round_up(max(int(cnt.max()), 1) if cnt.size else 1, 8)
        pairwise = (s_num - 1) * m
    else:
        pairwise = 0
        for o in range(1, s_num):
            worst = max(
                int(cnt[s, (s + o) % s_num]) for s in range(s_num)
            )
            pairwise += _round_up(max(worst, 1), 8)
    total = pairwise + (s_num - 1) * hub_k
    return {
        "order": order if isinstance(order, str) or order is None else "explicit",
        "sizing": sizing,
        "hub_threshold": hub_threshold,
        "hub_rows_per_shard": hub_k,
        "rows_exchanged_per_shard": total,
        "rows_psum_equivalent": n,
    }


def auto_partition_plan(
    graph: Graph,
    num_shards: int,
    orders: tuple = ("input", "bfs", "lpa"),
    hub_quantiles: tuple = (None, 0.999),
    sizings: tuple = ("global", "per_offset"),
    tie_tolerance: float = 0.02,
) -> dict:
    """Sweep the partition quality levers and pick the minimum-communication
    combination (round-2 VERDICT item 7: the levers helped 77K->31K
    rows/shard on structured graphs but needed hand-tuning; random graphs
    get NO reduction, so auto must fall back cleanly).

    Candidates within ``tie_tolerance`` of the best are broken toward the
    SIMPLEST config (input order before bfs before lpa; no hub before hub;
    global before per-offset sizing) — on a structureless graph every lever
    ties within noise and auto degrades to the plain input-order plan.
    Returns ``{"order", "sizing", "hub_threshold", "stats", "candidates"}``.
    """
    degrees = np.asarray(graph.degrees)
    hubs: list[int | None] = []
    for q in hub_quantiles:
        if q is None:
            hubs.append(None)
            continue
        thr = int(np.quantile(degrees, q))
        # A hub lever only pays when it marks a small, genuinely heavy set.
        if thr > max(8, int(np.median(degrees)) * 4) and (degrees >= thr).any():
            if thr not in hubs:
                hubs.append(thr)
    if not hubs:  # e.g. caller passed quantiles only and none qualified
        hubs = [None]
    simplicity = {
        "order": {o: i for i, o in enumerate(orders)},
        "sizing": {s: i for i, s in enumerate(sizings)},
    }
    # Resolve each order ONCE (BFS/LPA are O(E)-ish host passes; without
    # this they would rerun per hub x sizing candidate).
    resolved = {o: _resolve_order(graph, num_shards, o) for o in orders}
    candidates = []
    for o in orders:
        for hub in hubs:
            for sz in sizings:
                stats = partition_comm_rows(
                    graph, num_shards, order=o, sizing=sz, hub_threshold=hub,
                    _resolved=resolved[o],
                )
                rank = (
                    simplicity["order"].get(o, 99),
                    0 if hub is None else 1,
                    simplicity["sizing"].get(sz, 99),
                )
                candidates.append((stats["rows_exchanged_per_shard"], rank, o, sz, hub, stats))
    best_rows = min(c[0] for c in candidates)
    viable = [c for c in candidates if c[0] <= best_rows * (1 + tie_tolerance)]
    viable.sort(key=lambda c: (c[1], c[0]))
    rows, _, o, sz, hub, stats = viable[0]
    return {
        "order": o,
        "sizing": sz,
        "hub_threshold": hub,
        "stats": stats,
        "candidates": [c[5] for c in sorted(candidates, key=lambda c: c[0])],
    }


def build_node_partition(
    graph: Graph,
    num_shards: int,
    halo_chunks: int = 4,
    sizing: str = "global",
    hub_threshold: int | None = None,
    order: np.ndarray | str | None = None,
    bounds: str = "edges",
) -> NodePartition:
    """Host-side precompute of the halo-exchange plan (numpy).

    ``sizing``: ``"global"`` (chunked all_to_all, every pair padded to the
    global worst) or ``"per_offset"`` (S-1 ppermute rounds, each sized to
    its own worst pair). ``hub_threshold``: nodes with degree >= threshold
    move from the pairwise lists to one all_gather per layer. ``order``:
    ``None``/``"input"`` (node-id order), ``"bfs"``, ``"lpa"``, an explicit
    [N] permutation of global ids — or ``"auto"``, which sweeps
    order x sizing x hub-threshold via :func:`auto_partition_plan` and
    builds the minimum-communication combination (overriding the
    ``sizing``/``hub_threshold`` arguments with the swept winners).

    ``bounds``: ``"edges"`` (edge-count-balanced ranges, the default) or
    ``"equal_nodes"`` — fixed ``round_up(ceil(N/S), 8)``-node ranges in
    input order, the ownership rule of the node-sharded feature store
    (:func:`graphsage_tpu.parallel.feature_store.shard_features`); this is
    what lets the sharded trainers run their layer-0 table build through
    the halo exchange (boundary rows only) instead of an all_gather.
    ``bounds="equal_nodes"`` requires input order (ownership is id-range
    based) and is incompatible with ``order="lpa"``/``"bfs"``/``"auto"``."""
    if bounds not in ("edges", "equal_nodes"):
        raise ValueError(f"unknown bounds {bounds!r}")
    if bounds == "equal_nodes" and not (
        order is None or (isinstance(order, str) and order == "input")
    ):
        raise ValueError(
            "bounds='equal_nodes' requires input order — ownership is "
            "id-range based (feature-store compatibility)"
        )
    if isinstance(order, str) and order == "auto":
        plan = auto_partition_plan(graph, num_shards)
        order, sizing, hub_threshold = (
            plan["order"], plan["sizing"], plan["hub_threshold"]
        )
    if sizing not in ("global", "per_offset"):
        raise ValueError(f"unknown sizing {sizing!r}")
    indptr = np.asarray(graph.indptr).astype(np.int64)
    edge_dst = np.asarray(graph.edge_dst)[: graph.num_edges]
    # Halo h0 stacks raw rows — int8 tables dequantize here, once, on the
    # host (the full-graph path reads dense rows anyway).
    from graphsage_tpu.data.graph import reject_lazy_descriptor
    from graphsage_tpu.ops.quantize import dense_host_view

    reject_lazy_descriptor(
        graph.features,
        "build_node_partition (the halo h0 payload would stack N*F zeros; "
        "the full-graph/halo paths need eagerly loaded features)",
    )
    feats = dense_host_view(graph.features)
    labels = np.asarray(graph.labels)
    n = graph.num_nodes
    degrees = indptr[1:] - indptr[:-1]

    order, lpa_bounds = _resolve_order(graph, num_shards, order)
    pos_of = np.empty(n, dtype=np.int64)
    pos_of[order] = np.arange(n)

    # Contiguous position ranges balanced by edge count (lpa: the group
    # boundaries themselves), or fixed equal-node ranges matching the
    # feature store's id-range ownership.
    rows = None
    if bounds == "equal_nodes":
        rows = _round_up(max(-(-n // num_shards), 1), 8)
        bounds = np.minimum(np.arange(num_shards + 1) * rows, n)
    elif lpa_bounds is not None:
        bounds = lpa_bounds
    else:
        bounds = _edge_balanced_bounds(graph, order, num_shards)
    sizes = np.diff(bounds).astype(np.int32)
    np_pad = (
        rows if isinstance(rows, int)  # equal_nodes: pad == ownership stride
        else _round_up(max(int(sizes.max()), 1), 8)
    )
    owner_of_pos = np.searchsorted(bounds, np.arange(n), side="right") - 1
    owner_of = owner_of_pos[pos_of]  # global id -> shard
    local_of = (pos_of - np.asarray(bounds)[owner_of_pos][pos_of]).astype(
        np.int64
    )  # global id -> local row in its shard

    # Hub set: high-degree rows exchanged once via all_gather.
    hub_k = 0
    hub_send = None
    hub_slot_of: np.ndarray | None = None
    is_hub = np.zeros(n, dtype=bool)
    if hub_threshold is not None:
        is_hub = degrees >= int(hub_threshold)
        if is_hub.any():
            hub_ids = np.flatnonzero(is_hub)
            per_shard_hubs = [
                hub_ids[owner_of[hub_ids] == s] for s in range(num_shards)
            ]
            hub_k = _round_up(max(len(h) for h in per_shard_hubs), 8)
            hub_send = np.zeros((num_shards, hub_k), dtype=np.int32)
            hub_slot_of = np.zeros(n, dtype=np.int64)
            for s, ids in enumerate(per_shard_hubs):
                hub_send[s, : len(ids)] = local_of[ids]
                hub_slot_of[ids] = s * hub_k + np.arange(len(ids))
        else:
            is_hub = np.zeros(n, dtype=bool)

    # Per-shard edge lists (vectorized CSR gather over the shard's rows).
    shard_edges = []
    for s in range(num_shards):
        rows_g = order[bounds[s] : bounds[s + 1]]
        counts = degrees[rows_g]
        total = int(counts.sum())
        row_local = np.repeat(np.arange(len(rows_g)), counts)
        within = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
        )
        dst = edge_dst[np.repeat(indptr[rows_g], counts) + within]
        shard_edges.append((row_local, dst))

    # Pairwise boundary request sets (hubs excluded — they ride all_gather).
    need: list[dict[int, np.ndarray]] = []
    for s in range(num_shards):
        _, dst = shard_edges[s]
        owners = owner_of[dst]
        d: dict[int, np.ndarray] = {}
        boundary = (~is_hub[dst]) & (owners != s)
        for t in range(num_shards):
            if t == s:
                continue
            d[t] = np.unique(dst[boundary & (owners == t)])
        need.append(d)

    # --- boundary sizing ---------------------------------------------------
    rounds_meta: list[dict] | None = None
    if sizing == "global":
        m = max([1] + [len(v) for d in need for v in d.values()])
        m = _round_up(m, 8)
        q = m // 8
        chunks = max(1, min(int(halo_chunks), q))
        blocks = [q // chunks + (1 if i < q % chunks else 0) for i in range(chunks)]
        chunk_sizes = tuple(8 * b for b in blocks)
        chunk_starts = np.concatenate([[0], np.cumsum(chunk_sizes)]).astype(np.int64)
        send_plan = np.zeros((num_shards, num_shards, m), dtype=np.int32)
        for s in range(num_shards):
            for t, uniq in need[s].items():
                send_plan[t, s, : len(uniq)] = local_of[uniq]
    else:
        chunks = 0
        chunk_sizes = ()
        chunk_starts = None
        m = 0
        send_plan = np.zeros((num_shards, num_shards, 1), dtype=np.int32)
        rounds_meta = []
        for o in range(1, num_shards):
            m_o = _round_up(
                max([1] + [len(need[s][(s + o) % num_shards]) for s in range(num_shards)]),
                8,
            )
            send_o = np.zeros((num_shards, m_o), dtype=np.int32)
            for t in range(num_shards):
                uniq = need[(t - o) % num_shards][t]
                send_o[t, : len(uniq)] = local_of[uniq]
            rounds_meta.append({"offset": o, "size": m_o, "send": send_o})
            m += m_o

    # --- per-edge grouping -------------------------------------------------
    local_lists, hub_lists = [], []
    halo_lists: list[list[tuple[np.ndarray, np.ndarray]]] = []
    round_lists: list[list[tuple[np.ndarray, np.ndarray]]] = (
        [[] for _ in rounds_meta] if rounds_meta is not None else []
    )
    for s in range(num_shards):
        rows, dst = shard_edges[s]
        cnt = len(rows)
        owners = owner_of[dst] if cnt else np.zeros(0, dtype=np.int64)
        slots = np.zeros(cnt, dtype=np.int64)
        group = np.full(cnt, -1, dtype=np.int64)  # -1 local, -2 hub, else round/chunk
        hub_sel = is_hub[dst] & (owners != s) if cnt else np.zeros(0, bool)
        local_sel = (owners == s) & ~hub_sel
        slots[local_sel] = local_of[dst[local_sel]]
        group[hub_sel] = -2
        if hub_slot_of is not None:
            slots[hub_sel] = hub_slot_of[dst[hub_sel]]
        for t in range(num_shards):
            if t == s:
                continue
            sel = (owners == t) & ~hub_sel & ~local_sel
            if not sel.any():
                continue
            p = np.searchsorted(need[s][t], dst[sel])
            if sizing == "global":
                c = np.searchsorted(chunk_starts, p, side="right") - 1
                group[sel] = c
                slots[sel] = t * np.asarray(chunk_sizes)[c] + (p - chunk_starts[c])
            else:
                o = (t - s) % num_shards  # this pair's round
                group[sel] = o - 1
                slots[sel] = p  # recv buffer of round o is just [m_o]
        local_lists.append((rows[group == -1], slots[group == -1]))
        hub_lists.append((rows[group == -2], slots[group == -2]))
        if sizing == "global":
            halo_lists.append(
                [(rows[group == c], slots[group == c]) for c in range(chunks)]
            )
        else:
            for i in range(len(rounds_meta)):
                round_lists[i].append((rows[group == i], slots[group == i]))

    def pack(pairs, pad_to=128):
        e = _round_up(max(1, max(len(r) for r, _ in pairs)), pad_to)
        row = np.zeros((num_shards, e), dtype=np.int32)
        slot = np.zeros((num_shards, e), dtype=np.int32)
        mask = np.zeros((num_shards, e), dtype=bool)
        for s, (r, sl) in enumerate(pairs):
            row[s, : len(r)] = r
            slot[s, : len(r)] = sl
            mask[s, : len(r)] = True
        return row, slot, mask

    edge_local_row, edge_local_slot, edge_local_mask = pack(local_lists)

    if sizing == "global":
        eh = _round_up(
            max(1, max(len(r) for per in halo_lists for r, _ in per)), 128
        )
        edge_halo_row = np.zeros((num_shards, chunks, eh), dtype=np.int32)
        edge_halo_slot = np.zeros((num_shards, chunks, eh), dtype=np.int32)
        edge_halo_mask = np.zeros((num_shards, chunks, eh), dtype=bool)
        for s in range(num_shards):
            for c, (r, sl) in enumerate(halo_lists[s]):
                k = len(r)
                edge_halo_row[s, c, :k] = r
                edge_halo_slot[s, c, :k] = sl
                edge_halo_mask[s, c, :k] = True
        rounds = None
    else:
        edge_halo_row = np.zeros((num_shards, 1, 1), dtype=np.int32)
        edge_halo_slot = np.zeros((num_shards, 1, 1), dtype=np.int32)
        edge_halo_mask = np.zeros((num_shards, 1, 1), dtype=bool)
        rounds = tuple(
            OffsetRound(
                offset=meta["offset"],
                size=meta["size"],
                send=jnp.asarray(meta["send"]),
                edge_row=jnp.asarray(rr),
                edge_slot=jnp.asarray(ss),
                edge_mask=jnp.asarray(mm),
            )
            for meta, (rr, ss, mm) in zip(
                rounds_meta, (pack(per) for per in round_lists)
            )
        )

    if hub_send is not None:
        ehub_row, ehub_slot, ehub_mask = pack(hub_lists)
        hub_arrays = dict(
            hub_send=jnp.asarray(hub_send),
            edge_hub_row=jnp.asarray(ehub_row),
            edge_hub_slot=jnp.asarray(ehub_slot),
            edge_hub_mask=jnp.asarray(ehub_mask),
        )
    else:
        hub_arrays = dict(
            hub_send=None, edge_hub_row=None, edge_hub_slot=None,
            edge_hub_mask=None,
        )

    h0 = np.zeros((num_shards, np_pad, graph.num_features), feats.dtype)
    lab = np.zeros((num_shards, np_pad), np.int32)
    node_mask = np.zeros((num_shards, np_pad), bool)
    stacked_index = np.zeros(n, np.int64)
    for s in range(num_shards):
        rows_g = order[bounds[s] : bounds[s + 1]]
        sz = len(rows_g)
        h0[s, :sz] = feats[rows_g]
        lab[s, :sz] = labels[rows_g]
        node_mask[s, :sz] = True
        stacked_index[rows_g] = s * np_pad + np.arange(sz)

    return NodePartition(
        num_shards=num_shards,
        nodes_per_shard=np_pad,
        halo_size=m,
        halo_chunks=chunks if sizing == "global" else 0,
        chunk_sizes=chunk_sizes,
        sizes=jnp.asarray(sizes),
        node_order=jnp.asarray(order.astype(np.int32)),
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
        stacked_index=jnp.asarray(stacked_index.astype(np.int32)),
        rounds=rounds,
        hub_k=hub_k,
        **hub_arrays,
    )


# ---------------------------------------------------------------------------
# Exchange (runs inside shard_map)
# ---------------------------------------------------------------------------


def _exchange_arrays(part: NodePartition) -> tuple:
    """Arrays (all leading-dim S) a shard needs — passed through shard_map
    with a single ``P(axis)`` prefix spec."""
    return (
        part.send_plan,
        (part.edge_local_row, part.edge_local_slot, part.edge_local_mask),
        (part.edge_halo_row, part.edge_halo_slot, part.edge_halo_mask),
        tuple(r.send for r in part.rounds or ()),
        tuple(
            (r.edge_row, r.edge_slot, r.edge_mask) for r in part.rounds or ()
        ),
        (
            (part.hub_send, part.edge_hub_row, part.edge_hub_slot,
             part.edge_hub_mask)
            if part.hub_send is not None
            else ()
        ),
    )


def _halo_aggregate(
    axis: str,
    part: NodePartition,
    h_local: jax.Array,  # [1, Np, F] — this shard's rows (inside shard_map)
    ex: tuple,  # _exchange_arrays, shard-local ([1, ...] leaves)
    op: str,  # "sum" | "max"
) -> tuple[jax.Array, jax.Array]:
    """One halo-exchanged aggregation (generic sum/max). Local edges reduce
    immediately; hub rows arrive in one all_gather; boundary rows in
    all_to_all chunks (global sizing) or ppermute rounds (per-offset) —
    every collective depends only on the layer input, so they overlap with
    the interleaved per-round segment reductions. Returns
    ``([1, Np, F] aggregate, [1, Np] valid count)`` — the mean divide /
    max guard is applied here for sum/max respectively."""
    np_, f = h_local.shape[1], h_local.shape[2]
    s_axis = jax.lax.axis_size(axis)
    h0 = h_local[0]
    send_plan, e_local, e_halo, round_sends, round_edges, hub = ex
    neg = jnp.finfo(h_local.dtype).min

    def seg(buf, row, slot, mask):
        if op == "sum":
            # f32 accumulation for sums AND counts: bf16 scatter-adds
            # saturate near 256x the addend scale at hub degrees (counts
            # exactly; same-sign numerators progressively).
            w32 = mask.astype(jnp.float32)
            vals = jnp.take(buf, slot, axis=0).astype(jnp.float32) * w32[:, None]
            red = jax.ops.segment_sum(vals, row, num_segments=np_)
        else:
            vals = jnp.where(mask[:, None], jnp.take(buf, slot, axis=0), neg)
            red = jax.ops.segment_max(vals, row, num_segments=np_)
        cnt = jax.ops.segment_sum(
            mask.astype(jnp.float32), row, num_segments=np_
        )
        return red, cnt

    combine = (lambda a, b: a + b) if op == "sum" else jnp.maximum
    empty = (
        jnp.zeros((np_, f), jnp.float32)  # f32 running sum (see seg())
        if op == "sum"
        else jnp.full((np_, f), neg, h_local.dtype)
    )

    lrow, lslot, lmask = e_local
    acc, count = seg(h0, lrow[0], lslot[0], lmask[0])
    acc = combine(empty, acc)

    if hub:
        hub_send, hrow2, hslot2, hmask2 = hub
        mine = jnp.take(h0, hub_send[0], axis=0)  # [K, F]
        gathered = jax.lax.all_gather(mine, axis)  # [S, K, F]
        a, c = seg(
            gathered.reshape(s_axis * gathered.shape[1], f),
            hrow2[0], hslot2[0], hmask2[0],
        )
        acc = combine(acc, a)
        count = count + c

    if part.rounds is not None:
        for r, send_ids, (er, es, em) in zip(
            part.rounds, round_sends, round_edges
        ):
            send = jnp.take(h0, send_ids[0], axis=0)  # [m_o, F]
            recv = jax.lax.ppermute(
                send, axis,
                perm=[(t, (t - r.offset) % s_axis) for t in range(s_axis)],
            )
            a, c = seg(recv, er[0], es[0], em[0])
            acc = combine(acc, a)
            count = count + c
    else:
        hrow, hslot, hmask = e_halo
        off = 0
        for c_i, mc in enumerate(part.chunk_sizes):
            sp = send_plan[0][:, off : off + mc]  # [S, mc]
            off += mc
            send = jnp.take(h0, sp.reshape(-1), axis=0).reshape(s_axis, mc, f)
            recv = jax.lax.all_to_all(
                send, axis, split_axis=0, concat_axis=0, tiled=False
            )
            a, c = seg(
                recv.reshape(s_axis * mc, f), hrow[0, c_i], hslot[0, c_i],
                hmask[0, c_i],
            )
            acc = combine(acc, a)
            count = count + c

    if op == "sum":
        out = (acc / jnp.maximum(count, 1.0)[:, None]).astype(h_local.dtype)
    else:
        out = jnp.where((count > 0)[:, None], acc, jnp.zeros_like(acc))
    return out[None], count[None]


def halo_spmm_mean(axis, part, h_local, ex):
    """Halo-exchanged mean aggregation (call inside shard_map)."""
    return _halo_aggregate(axis, part, h_local, ex, op="sum")


def halo_segment_max(axis, part, h_local, ex):
    """Halo-exchanged guarded segment max (call inside shard_map)."""
    return _halo_aggregate(axis, part, h_local, ex, op="max")


def halo_full_graph_logits(
    model: GraphSAGE,
    params: SAGEParams,
    part: NodePartition,
    mesh: Mesh,
    axis: str = "graph",
    h0: jax.Array | None = None,
    return_embeddings: bool = False,
    stacked: bool = False,
) -> jax.Array:
    """Full-graph logits ``[N, C]`` with halo-exchange aggregation.

    Matches :meth:`GraphSAGE.forward_full_graph` allclose (test-pinned) for
    both aggregators and all combine modes.

    ``h0`` overrides the partition's stacked feature payload — pass it as a
    jit *argument* from training loops: a closed-over ``part.h0`` becomes an
    HLO constant, and XLA then constant-folds the whole first-layer
    aggregation at compile time (minutes-long compiles at 100K+ nodes).

    ``return_embeddings`` skips the head (rows are the ``[.., d_L]`` layer
    the head consumes); ``stacked=True`` returns the raw ``[S, Np, ·]``
    shard-stacked layout WITHOUT the replicating unpermute — the sharded
    serving table (each chip keeps only its shard's rows; positions map
    through ``part.stacked_index``)."""
    from graphsage_tpu.models.layers import (
        apply_full_graph_maxpool_layer,
        apply_full_graph_mean_layer,
    )

    if model.aggregator == "lstm":
        raise ValueError(
            "halo full-graph execution supports mean and maxpool only — an "
            "LSTM over neighbor sequences is not a per-edge segment "
            "reduction the boundary exchange can carry; train lstm models "
            "on the sampled paths"
        )

    def shard_fn(h, ex):
        if model.compute_dtype is not None:
            h = h.astype(model.compute_dtype)

        def spmm(x):
            # Project-first upstream means the boundary exchanges move
            # d_out-wide rows instead of d_in-wide.
            return halo_spmm_mean(axis, part, x, ex)

        def segmax(pooled):
            return halo_segment_max(axis, part, pooled, ex)

        for l in range(model.num_layers):
            if model.aggregator == "mean":
                h = apply_full_graph_mean_layer(
                    params.layers[l], h, spmm,
                    concat_self=model.concat_self,
                    self_loop=model.self_loop,
                    project_first=model.use_project_first(l, h.shape[-1]),
                    precision=model.matmul_precision,
                    activation=model.layer_activation(l),
                )
            else:
                h = apply_full_graph_maxpool_layer(
                    params.layers[l], h, segmax,
                    concat_self=model.concat_self,
                    self_loop=model.self_loop,
                    precision=model.matmul_precision,
                    activation=model.layer_activation(l),
                )
        if return_embeddings:
            return h.astype(jnp.float32)
        logits = jnp.einsum(
            "snd,dc->snc", h, params.head.astype(h.dtype),
            preferred_element_type=jnp.float32, precision=model.matmul_precision,
        )
        return logits.astype(jnp.float32)

    out = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(axis),
    )(part.h0 if h0 is None else h0, _exchange_arrays(part))

    if stacked:
        return out
    flat = out.reshape(part.num_shards * part.nodes_per_shard, -1)
    return jnp.take(flat, part.stacked_index, axis=0)
