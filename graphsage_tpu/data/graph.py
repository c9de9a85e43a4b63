"""Static-shape graph container for TPU execution.

The reference stores adjacency as ``defaultdict(set)`` and walks it with Python
loops (reference graphsage/model.py:61-62, encoders.py:39). That is unusable
under ``jax.jit``: everything here is a padded, fixed-shape device array so the
whole sample->gather->aggregate->project pipeline traces once and compiles.

Two adjacency views are kept, because different kernels want different layouts:

* **ELL / padded rows** — ``neighbors[N, W]``: the sampler's fast path (one
  row gather + fused slot select per frontier). ``W`` is capped at
  ``ell_width_cap`` (default 256): padding every row to the hub's degree is
  quadratic poison on power-law graphs (the 100K-node/1M-edge synthetic has
  max degree 13,668 vs median 15 — an uncapped table is 5.5 GB; capped,
  100 MB). When the cap truncates (``ell_covers_all == False``) the sampler
  switches to the CSR path: Floyd slots + ``edge_dst[indptr[v] + slot]``,
  which stays exactly uniform over the *full* neighbor set.
* **CSR** — ``indptr[N+1]`` + flat ``indices[E_pad]`` (+ ``edge_rows[E_pad]``
  as COO rows for segment ops). Always complete (never ELL-capped); feeds
  full-graph SpMM aggregation, hub-row sampling, and the edge partitioner.

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

    # ELL view (sampler hot path); width may be capped below the true max
    # degree (see module docstring) — CSR below is always complete.
    neighbors: jax.Array  # int32 [num_nodes, ell_width], padded with 0
    degrees: jax.Array  # int32 [num_nodes] — TRUE degrees (CSR row lengths)

    # CSR/COO view (full-graph aggregation, partitioning)
    indptr: jax.Array  # int32 [num_nodes + 1]
    edge_dst: jax.Array  # int32 [num_edges_pad]  (CSR column indices)
    edge_src: jax.Array  # int32 [num_edges_pad]  (COO row per edge)
    edge_mask: jax.Array  # bool  [num_edges_pad]  (False on padding)

    # Node payload
    features: jax.Array  # float [num_nodes, num_features]
    # int32 [num_nodes] single-label class ids, OR int8 [num_nodes,
    # num_classes] multi-hot rows (multilabel / PPI-family graphs — every
    # consumer indexes axis 0 only, so both layouts flow through unchanged)
    labels: jax.Array

    # Static metadata
    num_nodes: int = struct.field(pytree_node=False)
    num_features: int = struct.field(pytree_node=False)
    num_classes: int = struct.field(pytree_node=False)
    max_degree: int = struct.field(pytree_node=False)  # = ELL width
    num_edges: int = struct.field(pytree_node=False)  # directed edge slots in use
    # True when the ELL width covers every row's full neighbor list; False
    # means hub rows overflow into CSR and ELL-only paths would truncate.
    ell_covers_all: bool = struct.field(pytree_node=False, default=True)
    # True when the adjacency is symmetric (built undirected, no per-row
    # truncation) — enables the fused Pallas SpMM backward (A == A^T).
    symmetric: bool = struct.field(pytree_node=False, default=True)
    # Optional precomputed full-neighborhood feature means D^-1 A X
    # ([N, F], or a QuantizedTable), built ONCE by
    # :func:`with_cached_layer0`. Valid because the feature table is frozen
    # (reference model.py:70-71, requires_grad=False — quirk Q12): the
    # deepest-hop aggregate never changes across steps, so
    # ``GraphSAGE(layer0="cached")`` gathers these rows instead of sampling
    # + gathering + meaning B*prod(fanouts) raw rows every step.
    layer0_cache: jax.Array | None = None
    # Whether layer0_cache rows include the self feature in the mean
    # (``(sum + x_v) / (deg + 1)`` — the GCN-style self_loop semantics);
    # GraphSAGE.forward validates this against the model's self_loop flag.
    layer0_cache_self_loop: bool = struct.field(pytree_node=False, default=False)

    def __repr__(self) -> str:  # keep pytree printing readable
        return (
            f"Graph(N={self.num_nodes}, F={self.num_features}, "
            f"C={self.num_classes}, E={self.num_edges}, max_deg={self.max_degree})"
        )

    # ------------------------------------------------------------- placement
    @property
    def on_host(self) -> bool:
        """True when the array leaves are host numpy arrays (no device
        buffers). Host graphs are what the node-sharded trainers want: they
        slice features/adjacency on the host and place only the per-chip
        shards, so no device ever holds a full ``[N, F]`` table."""
        # tree_leaves, not isinstance: ``features`` may be a QuantizedTable
        # (ops/quantize.py) whose leaves carry the placement.
        leaves = jax.tree_util.tree_leaves(self.features)
        return bool(leaves) and isinstance(leaves[0], np.ndarray)

    def to_device(self, sharding=None) -> "Graph":
        """Place every array leaf on device (optionally with ``sharding``).

        One transfer per leaf; metadata is static and travels for free."""
        reject_lazy_descriptor(
            self.features, "Graph.to_device (it would place N*F zeros)"
        )
        put = (
            (lambda a: jax.device_put(a, sharding))
            if sharding is not None
            else jnp.asarray
        )
        return jax.tree_util.tree_map(put, self)

    def to_host(self) -> "Graph":
        """Copy every array leaf back to host numpy (frees device buffers
        once the device-side references drop)."""
        return jax.tree_util.tree_map(lambda a: np.asarray(a), self)


def is_lazy_descriptor(arr) -> bool:
    """True for the zero-strided feature placeholder the LAZY loaders ship
    (``load_*_lazy``): shape ``[N, F]`` but O(F) real bytes of zeros —
    a shape/dtype descriptor, never valid feature data."""
    return (
        isinstance(arr, np.ndarray)
        and arr.ndim == 2
        and arr.shape[0] > 1
        and arr.strides[0] == 0
    )


def reject_lazy_descriptor(features, what: str) -> None:
    """Fail loudly when a lazy graph's descriptor is about to be consumed
    as real data — silently training/serving on all-zero features is the
    failure mode the lazy path must never have."""
    if is_lazy_descriptor(features):
        raise ValueError(
            f"this graph's features are a LAZY descriptor (load_*_lazy) — "
            f"{what} would silently read N*F zeros. Build the sharded "
            "store with shard_features_from_loader(row_loader, ...) and "
            "pass it as feature_store=, or load eagerly instead"
        )


def sorted_unique_edges(
    num_nodes: int,
    edges: np.ndarray,
    undirected: bool = True,
) -> np.ndarray:
    """Deduplicated directed edge array [E, 2], sorted by (src, dst).

    Matches the reference's semantics: self-loops are kept only if present in
    the input (the reference adds none), duplicates collapse (set semantics,
    reference model.py:61-62), and ``undirected=True`` mirrors every edge.
    Fully vectorized — no per-row Python (a 1M-node/40M-edge build must not
    manipulate a million Python objects).
    """
    edges = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    if not len(edges):
        return np.zeros((0, 2), dtype=np.int64)
    n = np.int64(num_nodes)
    # Work on packed (src*N + dst) keys end to end — at 40M edges this host
    # moves memory at ~25 MB/s per pass, so every avoided pass matters
    # (np.unique + // + % cost ~110 s there; this formulation ~35 s).
    k1 = edges[:, 0] * n
    k1 += edges[:, 1]
    if undirected:
        k2 = edges[:, 1] * n
        k2 += edges[:, 0]
        keys = np.concatenate([k1, k2])
    else:
        keys = k1
    keys.sort(kind="stable")
    mask = np.empty(len(keys), bool)
    mask[0] = True
    np.not_equal(keys[1:], keys[:-1], out=mask[1:])
    uniq = keys[mask]  # sorted => (src, dst) lexicographic order
    src = uniq // n
    dst = uniq
    dst = dst - src * n  # cheaper than a second integer division (%)
    return np.stack([src, dst], axis=1)


def adjacency_from_edges(
    num_nodes: int,
    edges: np.ndarray,
    undirected: bool = True,
) -> list[np.ndarray]:
    """Per-row sorted neighbor lists (small-graph/test convenience API)."""
    e = sorted_unique_edges(num_nodes, edges, undirected=undirected)
    counts = np.bincount(e[:, 0], minlength=num_nodes)
    return np.split(e[:, 1], np.cumsum(counts)[:-1])


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
    ell_width_cap: int = 256,
    placement: str = "device",
) -> Graph:
    """Construct a :class:`Graph` from host-side numpy data.

    ``max_degree`` hard-truncates the graph: rows keep at most that many
    neighbors in *both* views (an explicit modeling choice, kept from the
    original API). Independently, ``ell_width_cap`` bounds only the padded
    ELL table's width — rows longer than the cap keep their full neighbor
    lists in CSR, and the sampler's CSR path stays uniform over them
    (``ell_covers_all`` records whether any row overflowed).

    ``placement="device"`` puts every leaf on the default device (the
    single-chip trainers' layout — the reference's resident ``nn.Embedding``
    role, model.py:70-71). ``placement="host"`` keeps numpy leaves: the
    node-sharded trainers consume host graphs directly, placing only each
    chip's ``N/S`` slice so no full-table device buffer ever exists
    (use :meth:`Graph.to_device` to place a host graph explicitly).
    """
    if placement not in ("device", "host"):
        raise ValueError(f"unknown placement {placement!r}")
    features = np.asarray(features)
    labels = np.asarray(labels)
    if labels.ndim == 2 and labels.shape[1] > 1:
        # Multi-hot [N, C] rows (multilabel / PPI family): kept 2-D, int8.
        labels = (labels != 0).astype(np.int8)
        if num_classes is None:
            num_classes = labels.shape[1]
        elif num_classes != labels.shape[1]:
            raise ValueError(
                f"num_classes ({num_classes}) != multi-hot label width "
                f"({labels.shape[1]})"
            )
    else:
        labels = labels.reshape(-1).astype(np.int32)
    num_nodes, num_features = features.shape
    if labels.shape[0] != num_nodes:
        raise ValueError(f"labels ({labels.shape[0]}) != num_nodes ({num_nodes})")
    if num_classes is None:
        num_classes = int(labels.max()) + 1 if num_nodes else 0

    edges = np.asarray(list(edges) if not isinstance(edges, np.ndarray) else edges)
    e = sorted_unique_edges(num_nodes, edges, undirected=undirected)
    src, dst = e[:, 0], e[:, 1]
    counts = np.bincount(src, minlength=num_nodes)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    rank = np.arange(len(src), dtype=np.int64) - starts[src]  # slot within row

    if max_degree is not None:
        # Explicit truncation: applies to the whole graph (both views).
        trunc = max(
            _round_up(max(max_degree, 1), degree_pad_multiple), degree_pad_multiple
        )
        keep = rank < trunc
        src, dst, rank = src[keep], dst[keep], rank[keep]
        counts = np.minimum(counts, trunc)
    true_degrees = counts.astype(np.int32)
    graph_max_deg = int(true_degrees.max()) if num_nodes and len(src) else 0

    ell_width = max(
        _round_up(max(min(graph_max_deg, ell_width_cap), 1), degree_pad_multiple),
        degree_pad_multiple,
    )
    ell_covers_all = ell_width >= graph_max_deg

    ell = np.zeros((num_nodes, ell_width), dtype=np.int32)
    in_ell = rank < ell_width
    ell[src[in_ell], rank[in_ell]] = dst[in_ell]

    # CSR over the FULL rows (never ELL-capped).
    indptr = np.zeros(num_nodes + 1, dtype=np.int32)
    np.cumsum(true_degrees, out=indptr[1:])
    num_edges = int(indptr[-1])
    e_pad = max(_round_up(max(num_edges, 1), edge_pad_multiple), edge_pad_multiple)
    edge_dst = np.zeros(e_pad, dtype=np.int32)
    edge_src = np.zeros(e_pad, dtype=np.int32)
    edge_mask = np.zeros(e_pad, dtype=bool)
    edge_dst[:num_edges] = dst
    edge_src[:num_edges] = src
    edge_mask[:num_edges] = True
    # Padding edges point at node 0 with src num_nodes-1 so segment ops stay in range.
    if num_edges < e_pad and num_nodes:
        edge_src[num_edges:] = num_nodes - 1

    mk = np.asarray if placement == "host" else jnp.asarray
    return Graph(
        neighbors=mk(ell),
        degrees=mk(true_degrees),
        indptr=mk(indptr),
        edge_dst=mk(edge_dst),
        edge_src=mk(edge_src),
        edge_mask=mk(edge_mask),
        features=mk(np.asarray(features).astype(feature_dtype, copy=False)),
        labels=mk(labels),
        num_nodes=num_nodes,
        num_features=num_features,
        num_classes=int(num_classes),
        max_degree=ell_width,
        num_edges=num_edges,
        ell_covers_all=bool(ell_covers_all),
        # Per-row truncation (explicit max_degree) drops (u,v) without
        # dropping (v,u) — the result is generally asymmetric.
        symmetric=bool(undirected and max_degree is None),
    )


def quantize_graph(graph: Graph) -> Graph:
    """Replace the dense feature table with an int8 per-row
    :class:`~graphsage_tpu.ops.quantize.QuantizedTable` (2-4x smaller
    resident table, int8 deepest-hop gathers — see ops/quantize.py).

    Valid because the table is frozen (reference model.py:70-71,
    ``requires_grad=False``): quantization happens once, here, and the
    training loop never writes it. Placement is preserved (host graphs
    quantize in numpy on the host). Idempotent.
    """
    from graphsage_tpu.ops.quantize import is_quantized, quantize_features

    if is_quantized(graph.features):
        return graph
    reject_lazy_descriptor(
        graph.features,
        "quantize_graph (use shard_features_from_loader(quantize=True))",
    )
    feats = graph.features
    if isinstance(feats, np.ndarray) and not feats.flags.c_contiguous:
        feats = np.ascontiguousarray(feats)
    # A pre-built layer0_cache is stale after quantization: the cached
    # estimand would stay D^-1 A X while the sampled estimator targets
    # D^-1 A dequant(X) — drop it so the trainers' auto-build recomputes
    # (int8) from the quantized table instead of silently diverging.
    if graph.layer0_cache is not None:
        import warnings

        warnings.warn(
            "quantize_graph: dropping the pre-built layer0_cache (it was "
            "computed from the un-quantized features); the trainers will "
            "rebuild it int8 — quantize FIRST to pay the build once",
            stacklevel=2,
        )
    return graph.replace(
        features=quantize_features(feats),
        layer0_cache=None,
        layer0_cache_self_loop=False,
    )


def with_cached_layer0(
    graph: Graph,
    self_loop: bool = False,
    dtype=None,
    quantize: bool = False,
    edge_block: int = 2_000_000,
) -> Graph:
    """Attach the precomputed full-neighborhood feature means
    ``M = D^-1 A X`` (``(A X + X) / (D + 1)`` with ``self_loop=True``) as
    ``graph.layer0_cache`` — the one-time build behind
    ``GraphSAGE(layer0="cached")``.

    Why this is exact: the feature table is FROZEN (reference
    model.py:70-71, ``requires_grad=False`` — quirk Q12) and the masked
    mean is linear, so the deepest hop's neighbor aggregate is a constant
    per node. Sampling it every step (the reference's default path,
    aggregators.py:38-64) is an unbiased *estimator* of these rows; the
    cache IS the estimand — the reference's own ``num_sample=None``
    semantics (quirk Q7) applied to the input-closest layer. Per step,
    the ``B * prod(fanouts)`` deepest-hop row gathers (and the whole
    deepest sampling hop) collapse to one ``[hop L-1]``-row gather; the
    backward scatter into the feature table disappears because ``M`` is
    not differentiated (docs/ROOFLINE.md §5.1b).

    Zero-degree rows are 0 (the guarded-mean policy, quirk Q4).
    ``dtype`` defaults to the dense feature dtype (bf16 features keep a
    bf16 cache); ``quantize=True`` stores the cache as an int8
    :class:`~graphsage_tpu.ops.quantize.QuantizedTable` instead (the
    capacity lever for int8 graphs). Host graphs build in blocked numpy
    (CSR ``np.add.reduceat``); device graphs in an edge-chunked
    segment-sum scan (``edge_block`` bounds the per-chunk transient).
    Idempotent per ``self_loop`` flavor.
    """
    from graphsage_tpu.ops.quantize import (
        dequantize,
        gather_dequant,
        is_quantized,
        quantize_features,
        quantize_rows,
    )

    if graph.layer0_cache is not None:
        if bool(graph.layer0_cache_self_loop) != bool(self_loop):
            raise ValueError(
                "graph already carries a layer0_cache with "
                f"self_loop={graph.layer0_cache_self_loop} — rebuild from "
                "the base graph (graph.replace(layer0_cache=None)) to "
                "switch flavors"
            )
        if bool(quantize) != is_quantized(graph.layer0_cache):
            raise ValueError(
                "graph already carries a "
                f"{'quantized' if is_quantized(graph.layer0_cache) else 'dense'}"
                f" layer0_cache but quantize={quantize} was requested — "
                "rebuild from the base graph "
                "(graph.replace(layer0_cache=None)) to switch"
            )
        return graph
    reject_lazy_descriptor(graph.features, "with_cached_layer0")
    quantized = is_quantized(graph.features)
    n, e = graph.num_nodes, graph.num_edges

    if graph.on_host:
        # Never materialize a full dense view of an int8 table (1 GB f32 at
        # the 1M x 256 flagship — 4x what quantize_graph shrinks to):
        # dequantize per block so the transient stays edge_block rows.
        if quantized:
            _q = np.asarray(graph.features.q)
            _sc = np.asarray(graph.features.scale, np.float32)
            f = _q.shape[1]

            def _rows(idx):
                return _q[idx].astype(np.float32) * _sc[idx]

            if dtype is None:
                dtype = np.float32
        else:
            feats = np.asarray(graph.features)
            f = feats.shape[1]

            def _rows(idx):
                return feats[idx].astype(np.float32)

            if dtype is None:
                dtype = feats.dtype
        indptr = np.asarray(graph.indptr)
        edge_dst = np.asarray(graph.edge_dst)
        deg = np.asarray(graph.degrees).astype(np.float32)
        out = np.zeros((n, f), np.float32)
        r0 = 0
        while r0 < n:
            # Node-range block whose CSR span stays <= edge_block rows
            # (side="right" - 1 = last node whose span still fits; a single
            # node wider than edge_block gets its own block via the max).
            r1 = int(
                np.searchsorted(indptr, indptr[r0] + edge_block, side="right")
            ) - 1
            r1 = max(min(r1, n), r0 + 1)
            s0, s1 = int(indptr[r0]), int(indptr[r1])
            rows = _rows(edge_dst[s0:s1])
            # Pad one zero row so empty trailing segments index in-range;
            # np.add.reduceat returns garbage for empty segments (it yields
            # a[start]), which the degree-0 zeroing below overwrites.
            rows = np.concatenate([rows, np.zeros((1, f), np.float32)])
            starts = np.minimum(indptr[r0:r1] - s0, len(rows) - 1)
            sums = np.add.reduceat(rows, starts, axis=0)
            blk_deg = deg[r0:r1]
            sums[blk_deg == 0] = 0.0
            if self_loop:
                out[r0:r1] = (sums + _rows(slice(r0, r1))) / (
                    blk_deg[:, None] + 1.0
                )
            else:
                out[r0:r1] = sums / np.maximum(blk_deg[:, None], 1.0)
            r0 = r1
        cache = (
            quantize_features(out) if quantize else out.astype(dtype)
        )
        return graph.replace(
            layer0_cache=cache, layer0_cache_self_loop=bool(self_loop)
        )

    import jax
    import jax.numpy as jnp

    feats = graph.features
    if dtype is None:
        dtype = jnp.float32 if quantized else feats.dtype
    e_pad = graph.edge_dst.shape[0]
    # Never pad PAST the edge list: a small graph must not pay a full
    # edge_block of zero-slot gathers (50K slots would round to 2M).
    edge_block = max(min(edge_block, e_pad), 1)
    nblk = max(-(-e_pad // edge_block), 1)
    pad_to = nblk * edge_block
    extra = pad_to - e_pad

    def _pad(a, fill):
        return jnp.concatenate([a, jnp.full((extra,), fill, a.dtype)]) if extra else a

    dst = _pad(graph.edge_dst, 0).reshape(nblk, edge_block)
    src = _pad(graph.edge_src, max(n - 1, 0)).reshape(nblk, edge_block)
    msk = _pad(graph.edge_mask, False).reshape(nblk, edge_block)
    dense_width = feats.shape[-1]  # QuantizedTable mirrors dense .shape

    @jax.jit
    def build(feats, dst, src, msk, deg):
        def body(acc, blk):
            d, s, m = blk
            rows = (
                gather_dequant(feats, d)
                if quantized
                else jnp.take(feats, d, axis=0).astype(jnp.float32)
            )
            return acc + jax.ops.segment_sum(
                rows * m.astype(jnp.float32)[:, None], s, num_segments=n
            ), None

        acc = jnp.zeros((n, dense_width), jnp.float32)
        acc, _ = jax.lax.scan(body, acc, (dst, src, msk))
        d32 = deg.astype(jnp.float32)[:, None]
        if self_loop:
            x32 = (
                dequantize(feats, jnp.float32)
                if quantized
                else feats.astype(jnp.float32)
            )
            return (acc + x32) / (d32 + 1.0)
        return acc / jnp.maximum(d32, 1.0)

    out = build(feats, dst, src, msk, graph.degrees)
    cache = quantize_rows(out) if quantize else out.astype(dtype)
    return graph.replace(
        layer0_cache=cache, layer0_cache_self_loop=bool(self_loop)
    )


def induced_subgraph(graph: Graph, nodes: np.ndarray, **build_kwargs) -> Graph:
    """The subgraph induced on ``nodes`` (ids relabeled to ``0..len-1``).

    The inductive-workflow primitive (tests/test_inductive.py,
    examples/06_inductive.py): train on ``induced_subgraph(g, seen)``,
    then run the SAME params on the grown graph — parameters are
    graph-independent, so nothing else changes. Host-side numpy;
    ``build_kwargs`` forward to :func:`build_graph` (placement etc.).
    """
    from graphsage_tpu.ops.quantize import dense_host_view

    reject_lazy_descriptor(graph.features, "induced_subgraph")
    nodes = np.asarray(nodes).reshape(-1)
    feats = dense_host_view(graph.features)[nodes]
    labels = np.asarray(graph.labels)[nodes]
    src = np.asarray(graph.edge_src)[: graph.num_edges]
    dst = np.asarray(graph.edge_dst)[: graph.num_edges]
    inv = -np.ones(graph.num_nodes, np.int64)
    inv[nodes] = np.arange(len(nodes))
    m = (inv[src] >= 0) & (inv[dst] >= 0)
    edges = np.stack([inv[src[m]], inv[dst[m]]], axis=1)
    # The source edge list is already mirrored+deduped; don't re-mirror.
    build_kwargs.setdefault("undirected", False)
    sub = build_graph(
        feats, labels, edges, num_classes=graph.num_classes, **build_kwargs
    )
    # Inducing on a symmetric graph keeps both directions of every
    # surviving edge, so the subgraph is symmetric — restore the flag
    # build_graph(undirected=False) conservatively cleared (it gates the
    # scatter-free full-graph backward).
    if graph.symmetric and build_kwargs.get("max_degree") is None:
        sub = sub.replace(symmetric=True)
    return sub


def disjoint_union(graphs: Sequence[Graph], **build_kwargs) -> Graph:
    """One :class:`Graph` holding every input graph side by side, node ids
    offset so no edges cross inputs.

    The multigraph-training primitive of the inductive (PPI-style)
    workflow: train one model over ``disjoint_union(train_graphs)`` —
    message passing never leaks across components, so it is exactly
    per-graph training with shared parameters — then evaluate the same
    params on each held-out graph directly (parameters are
    graph-independent). No reference counterpart (the reference is
    single-graph transductive, model.py:39-63).

    All inputs must agree on feature width, label layout and
    ``num_classes``. Host-side numpy; ``build_kwargs`` forward to
    :func:`build_graph`.
    """
    from graphsage_tpu.ops.quantize import dense_host_view

    if not graphs:
        raise ValueError("disjoint_union of no graphs")
    g0 = graphs[0]
    for g in graphs:
        reject_lazy_descriptor(g.features, "disjoint_union")
        if g.num_features != g0.num_features:
            raise ValueError("feature widths differ across graphs")
        if g.num_classes != g0.num_classes:
            raise ValueError("num_classes differs across graphs")
        if np.asarray(g.labels).ndim != np.asarray(g0.labels).ndim:
            raise ValueError("label layouts differ across graphs")
    feats = np.concatenate([dense_host_view(g.features) for g in graphs])
    labels = np.concatenate([np.asarray(g.labels) for g in graphs])
    parts, offset = [], 0
    for g in graphs:
        e = g.num_edges
        src = np.asarray(g.edge_src)[:e] + offset
        dst = np.asarray(g.edge_dst)[:e] + offset
        parts.append(np.stack([src, dst], axis=1))
        offset += g.num_nodes
    edges = np.concatenate(parts) if parts else np.zeros((0, 2), np.int64)
    # Source edge lists are already mirrored+deduped where symmetric, so
    # build directed — but a union of symmetric graphs IS symmetric (the
    # offsets move both directions together), so restore the flag that
    # build_graph(undirected=False) conservatively clears.
    build_kwargs.setdefault("undirected", False)
    union = build_graph(
        feats, labels, edges, num_classes=g0.num_classes, **build_kwargs
    )
    if all(g.symmetric for g in graphs) and build_kwargs.get("max_degree") is None:
        union = union.replace(symmetric=True)
    return union


def relabel_graph(
    graph: Graph,
    order: np.ndarray,
    placement: str | None = None,
) -> tuple[Graph, np.ndarray]:
    """Rebuild ``graph`` with node ids permuted: old node ``order[i]``
    becomes new id ``i``. Returns ``(relabeled graph, perm)`` with
    ``perm[old_id] = new_id`` (features, labels and adjacency all move;
    the edge SET is untouched, so every order-invariant computation —
    the deterministic full-graph forward included — is preserved up to
    the row permutation: ``logits_new[perm[v]] == logits_old[v]``).

    This is the locality-preprocessing hook: every id-RANGE ownership
    rule in the framework (``shard_features``'s node-sharded store, the
    halo plan's ``bounds="equal_nodes"``, the distributed sampler's
    owner routing) becomes structure-aware when ids are assigned in a
    community/BFS order — see
    :func:`graphsage_tpu.parallel.halo.locality_relabel` for the one-call
    version, and docs/DISTRIBUTED.md for the measured effect. The
    reference has no counterpart (ids are file order, model.py:46-49).

    ``placement`` defaults to the source graph's (host stays host).
    """
    order = np.asarray(order, dtype=np.int64).reshape(-1)
    n = graph.num_nodes
    if order.shape[0] != n or len(np.unique(order)) != n:
        raise ValueError("order must be a permutation of all node ids")
    from graphsage_tpu.ops.quantize import is_quantized

    if is_quantized(graph.features):
        raise ValueError(
            "relabel before quantizing: per-row scales move with their rows, "
            "so quantize_graph(relabel_graph(dense_graph, order)[0]) is "
            "identical and keeps this function simple"
        )
    perm = np.empty(n, dtype=np.int64)
    perm[order] = np.arange(n, dtype=np.int64)
    feats = np.asarray(graph.features)[order]
    labels = np.asarray(graph.labels)[order]
    e = graph.num_edges
    src = perm[np.asarray(graph.edge_src)[:e]]
    dst = perm[np.asarray(graph.edge_dst)[:e]]
    if graph.symmetric:
        # The directed list carries both directions; rebuild from the
        # upper triangle so build_graph re-mirrors (symmetric preserved).
        keep = src <= dst
        edges = np.stack([src[keep], dst[keep]], axis=1)
        undirected = True
    else:
        edges = np.stack([src, dst], axis=1)
        undirected = False
    relabeled = build_graph(
        feats,
        labels,
        edges,
        num_classes=graph.num_classes,
        undirected=undirected,
        feature_dtype=np.asarray(graph.features).dtype,
        placement=placement or ("host" if graph.on_host else "device"),
    )
    return relabeled, perm
