"""Node-sharded feature store with cross-shard sampled gather.

The reference holds the whole feature table in one frozen ``nn.Embedding``
and looks rows up locally (reference graphsage/model.py:70-71). Replicating
that table per chip caps what a pod can train: 1M nodes x 256 feats is
~1 GB f32 *per chip* before activations. This module shards the ``[N, F]``
table on the NODE dimension across a mesh axis and turns the deepest-hop
feature lookup of sampled training into a cross-shard exchange
(SURVEY.md §2.3 row 3: "sharded gather, cross-shard all-to-all of requested
rows"), so per-chip feature memory is ``N/S * F``.

Design (TPU-first, static shapes end to end):

* Nodes are split into ``S`` equal contiguous ranges; shard ``s`` owns rows
  ``[s*Np, (s+1)*Np)`` (``Np = ceil(N/S)``, zero-padded tail). Ownership of
  any id is ``id // Np`` — no lookup table.
* The *same* mesh axis carries data parallelism: each shard holds the
  frontier slice of its own seed sub-batch. One axis, two roles — feature
  rows and batch both scale with ``S``.
* ``sharded_gather`` (inside ``shard_map``): ``all_gather`` the request ids
  (ids are 4-byte scalars — cheap), masked local row gather (every chip
  serves the requests it owns), then one ``psum_scatter`` returns each
  chip exactly its own requested rows, summed across owners (each row has
  exactly one owner, so the sum is a select). Fully differentiable: the
  transpose is all_gather <-> psum_scatter with a scatter-add into the
  local shard, which is exactly the backward the feature/projection
  gradient needs.
* Communication per chip per layer-0 gather: the ``psum_scatter`` reduces
  an ``[S, q, F]`` partials array, which moves ``(S-1) * q * F`` elements
  per chip over the ring (q = per-chip frontier size; every non-owned
  partial is a shipped zero row) plus the negligible id all_gather. The
  compact exchange below cuts this to ``(S-1) * capacity * F`` (ids out —
  4-byte scalars, rows back) — ``q / capacity ~= S / slack`` times less. With
  ``project_first`` the table is projected shard-locally on the MXU first,
  so the exchanged rows are d_out-wide (128 vs 1433 on Cora — the same
  4-11x saving as single-chip).

The dense-partials formulation ships zeros for rows a chip does not own
(factor ~S vs a perfectly compacted route-by-owner all_to_all), but it is
exact with *static* shapes for any id distribution — no per-pair capacity
that a hub-heavy batch could overflow. The compact variant is a measured
follow-up, not a correctness need.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import optax

from graphsage_tpu.data.graph import Graph
from graphsage_tpu.models.graphsage import Frontier, GraphSAGE, SAGEParams
from graphsage_tpu.ops.aggregate import masked_mean
from graphsage_tpu.ops.quantize import QuantizedTable, is_quantized
from graphsage_tpu.train.trainer import Trainer, TrainState


def _guard_state_update(violated, old_state, new_state):
    """Make a capacity-violated step a NO-OP on the training state.

    When any per-pair routing bucket overflowed, the gathered rows were
    clipped and the computed gradients are garbage — applying them would
    silently corrupt training. Selecting the OLD leaves under ``violated``
    means the returned state equals the pre-step state, so the host-side
    retry ladder (:meth:`ShardedFeatureTrainer.step`) can redo the same
    batch at doubled slack from the returned state — exact even with
    buffer donation (the donated input buffers are consumed, but the
    returned values are the old ones). The key is also kept, so the retry
    resamples the SAME frontier deterministically at the larger capacity.
    """
    return jax.tree_util.tree_map(
        lambda old, new: jnp.where(violated, old, new), old_state, new_state
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _lead0(shard):
    """Strip the leading shard_map block dim from a feature-shard payload —
    a plain ``[1, Np, F]`` array or a :class:`QuantizedTable` of such leaves
    (plain ``shard[0]`` on a NamedTuple would select a FIELD, not a row)."""
    return jax.tree_util.tree_map(lambda a: a[0], shard)


@struct.dataclass
class NodeShardedFeatures:
    """The ``[N, F]`` table as ``S`` stacked node-range shards.

    ``shards`` carries a leading shard dim meant to be placed with
    ``NamedSharding(mesh, P(axis))`` so each chip holds one ``[Np, F]``
    slice. Padding rows (beyond ``num_nodes``) are zero."""

    shards: jax.Array  # [S, Np, F]
    num_shards: int = struct.field(pytree_node=False)
    rows_per_shard: int = struct.field(pytree_node=False)
    num_nodes: int = struct.field(pytree_node=False)

    def memory_stats(self) -> dict:
        """Bytes/chip sharded vs replicated — the point of the exercise."""
        itemsize = jnp.dtype(self.shards.dtype).itemsize
        f = int(self.shards.shape[-1])
        # int8 tables carry a [Np, 1] f32 scale column per chip.
        scale_b = 4 if is_quantized(self.shards) else 0
        return {
            "num_shards": self.num_shards,
            "rows_per_shard": self.rows_per_shard,
            "feature_bytes_per_chip": (
                self.rows_per_shard * (f * itemsize + scale_b)
            ),
            "feature_bytes_replicated": (
                self.num_nodes * (f * itemsize + scale_b)
            ),
            "memory_reduction": (
                self.num_nodes / max(self.rows_per_shard, 1)
            ),
        }


def shard_features(
    features: jax.Array, num_shards: int, sharding=None
) -> NodeShardedFeatures:
    """Split ``features[N, F]`` into equal node-range shards (host-side).

    ``sharding`` places the stacked array directly (one device transfer to
    the SHARDED layout); without it the array lands on the default device.
    Building from numpy and placing once matters: an intermediate unsharded
    device copy of the full [S, Np, F] stack would silently keep a second
    whole-table resident and defeat the memory accounting.

    A :class:`~graphsage_tpu.ops.quantize.QuantizedTable` shards the same
    way (q and the per-row scale column split on the same node ranges);
    the cross-shard gathers then exchange int8 rows + 4-byte scales —
    see :func:`sharded_row_gather` / :func:`sharded_row_gather_compact`."""
    from graphsage_tpu.data.graph import reject_lazy_descriptor

    reject_lazy_descriptor(
        features, "shard_features (the shards would be all-zero copies)"
    )
    quant = is_quantized(features)
    feats = np.asarray(features.q if quant else features)
    n, f = feats.shape
    rows = _round_up(max(-(-n // num_shards), 1), 8)

    def stack(a, width, fill=0):
        out = np.full((num_shards, rows, width), fill, a.dtype)
        for s in range(num_shards):
            lo = min(s * rows, n)
            hi = min(lo + rows, n)
            out[s, : hi - lo] = a[lo:hi]
        return out

    if quant:
        # Padding rows keep scale 1 (their q rows are zero — dequant 0).
        stacked = QuantizedTable(
            q=stack(feats, f),
            scale=stack(np.asarray(features.scale), 1, fill=1),
        )
    else:
        stacked = stack(feats, f)
    placed = (
        jax.device_put(stacked, sharding)
        if sharding is not None
        else jax.tree_util.tree_map(jnp.asarray, stacked)
    )
    return NodeShardedFeatures(
        shards=placed,
        num_shards=num_shards,
        rows_per_shard=rows,
        num_nodes=n,
    )


def shard_features_from_loader(
    row_loader,
    num_nodes: int,
    num_feats: int,
    num_shards: int,
    sharding,
    dtype=np.float32,
    quantize: bool = False,
) -> NodeShardedFeatures:
    """Build the node-sharded store WITHOUT ever materializing the full
    ``[N, F]`` table on any host.

    ``row_loader(lo, hi) -> np.ndarray [hi-lo, F]`` supplies feature rows on
    demand (e.g. :func:`graphsage_tpu.data.loaders.load_cora_lazy`'s
    byte-offset parser). Shards build per ADDRESSABLE device, so on an
    M-process pod each host parses and holds ``N/M`` rows — peak host RAM
    drops from ``2·N·F`` (full table + stacked copy in
    :func:`shard_features`) to ``N·F/M``. Single-process meshes behave
    identically to :func:`shard_features` on the same rows (test-pinned).

    ``quantize=True`` int8-quantizes each loaded block before placement —
    per-ROW symmetric scales make quantization local to the owner, so it
    composes with lazy ingestion for free (the transient f32 block is
    one shard's rows, never the table) and the store is bit-identical to
    ``shard_features(quantize_features(full_table))``.
    """
    rows = _round_up(max(-(-num_nodes // num_shards), 1), 8)
    shape = (num_shards, rows, num_feats)
    dtype = np.dtype(dtype)

    # make_array_from_single_device_arrays over the ADDRESSABLE index map —
    # unlike make_array_from_callback (which may probe non-local indices),
    # this provably touches only this process's shards (asserted across a
    # real 2-process mesh in tests/test_multiprocess.py).
    def local_block(idx):
        s_lo, s_hi, step = idx[0].indices(num_shards)
        assert step == 1, "shard axis must not be strided"
        out = np.zeros((s_hi - s_lo, rows, num_feats), dtype)
        for j, s in enumerate(range(s_lo, s_hi)):
            lo = min(s * rows, num_nodes)
            hi = min(lo + rows, num_nodes)
            if hi > lo:
                out[j, : hi - lo] = row_loader(lo, hi)
        return out

    addr = sharding.addressable_devices_indices_map(shape).items()

    # Replicated mesh axes hand several devices the SAME index — load (and
    # quantize) each distinct block once and reuse it for every replica,
    # instead of re-parsing from disk per device.
    _blocks: dict = {}

    def cached_block(idx):
        key = tuple(
            (sl.start, sl.stop, sl.step) if isinstance(sl, slice) else sl
            for sl in idx
        )
        if key not in _blocks:
            _blocks[key] = local_block(idx)
        return _blocks[key]

    if quantize:
        from graphsage_tpu.ops.quantize import quantize_features

        q_pieces, s_pieces = [], []
        _qblocks: dict = {}
        for dev, idx in addr:
            blk = cached_block(idx)
            qkey = id(blk)
            if qkey not in _qblocks:
                # Padding rows are all-zero, so quantize_features gives them
                # scale 1 — exactly shard_features' quantized stacking rule.
                _qblocks[qkey] = quantize_features(blk.reshape(-1, num_feats))
            qt = _qblocks[qkey]
            q = qt.q.reshape(blk.shape)
            sc = qt.scale.reshape(blk.shape[0], rows, 1)
            q_pieces.append(jax.device_put(q[:, idx[1], idx[2]], dev))
            s_pieces.append(jax.device_put(sc[:, idx[1], :1], dev))
        placed = QuantizedTable(
            q=jax.make_array_from_single_device_arrays(shape, sharding, q_pieces),
            scale=jax.make_array_from_single_device_arrays(
                (num_shards, rows, 1), sharding, s_pieces
            ),
        )
    else:
        pieces = [
            jax.device_put(cached_block(idx)[:, idx[1], idx[2]], dev)
            for dev, idx in addr
        ]
        placed = jax.make_array_from_single_device_arrays(shape, sharding, pieces)
    return NodeShardedFeatures(
        shards=placed,
        num_shards=num_shards,
        rows_per_shard=rows,
        num_nodes=num_nodes,
    )


@struct.dataclass
class ShardEdgeSlices:
    """Per-shard COO edge slice for the sharded layer-0 full-graph pass:
    shard ``s`` holds the edges whose SOURCE (destination-of-aggregation)
    node lies in its range, with source ids LOCAL (0..Np) and neighbor ids
    GLOBAL (they index the all_gathered projected table)."""

    edge_src: jax.Array  # [S, Em] local row index of the aggregating node
    edge_dst: jax.Array  # [S, Em] GLOBAL neighbor id
    edge_mask: jax.Array  # [S, Em] padding mask
    degrees: jax.Array  # [S, Np] true degrees of the shard's rows
    num_shards: int = struct.field(pytree_node=False)
    rows_per_shard: int = struct.field(pytree_node=False)

    @property
    def leaves(self):
        return (self.edge_src, self.edge_dst, self.edge_mask, self.degrees)


def shard_edge_slices(
    graph: Graph, num_shards: int, sharding=None
) -> ShardEdgeSlices:
    """Split the graph's CSR edge list into equal node-range shards
    (host-side; same ownership rule as :func:`shard_features`). Each
    shard's slice is padded to the max per-shard edge count — static
    shapes under shard_map."""
    indptr = np.asarray(graph.indptr).astype(np.int64)
    edge_dst = np.asarray(graph.edge_dst)
    edge_mask = np.asarray(graph.edge_mask)
    deg = np.asarray(graph.degrees)
    n = graph.num_nodes
    rows = _round_up(max(-(-n // num_shards), 1), 8)
    e_max = 1
    for s in range(num_shards):
        lo, hi = min(s * rows, n), min(s * rows + rows, n)
        e_max = max(e_max, int(indptr[hi] - indptr[lo]))
    e_max = _round_up(e_max, 128)
    src_s = np.zeros((num_shards, e_max), np.int32)
    dst_s = np.zeros((num_shards, e_max), np.int32)
    msk_s = np.zeros((num_shards, e_max), bool)
    deg_s = np.zeros((num_shards, rows), np.int32)
    for s in range(num_shards):
        lo, hi = min(s * rows, n), min(s * rows + rows, n)
        deg_s[s, : hi - lo] = deg[lo:hi]
        e = int(indptr[hi] - indptr[lo])
        sl = slice(int(indptr[lo]), int(indptr[hi]))
        src_s[s, :e] = (
            np.repeat(np.arange(hi - lo), np.diff(indptr[lo : hi + 1]))
        )
        dst_s[s, :e] = edge_dst[sl]
        msk_s[s, :e] = edge_mask[sl]
    place = (
        (lambda a: jax.device_put(a, sharding))
        if sharding is not None
        else jnp.asarray
    )
    return ShardEdgeSlices(
        edge_src=place(src_s),
        edge_dst=place(dst_s),
        edge_mask=place(msk_s),
        degrees=place(deg_s),
        num_shards=num_shards,
        rows_per_shard=rows,
    )


def make_sharded_spmm(
    axis: str,
    e_src: jax.Array,  # [Em] LOCAL row index of the aggregating node
    e_dst: jax.Array,  # [Em] GLOBAL neighbor id
    e_mask: jax.Array,  # [Em]
    deg: jax.Array,  # [Np] true degrees of this shard's rows
    rows_per_shard: int,
):
    """The ``spmm`` closure for :meth:`GraphSAGE.layer0_full_table` inside
    shard_map: ``all_gather`` every shard's (projected) rows into the full
    ``[S*Np, d]`` table — d0-wide under project-first, the cheap case the
    mode exists for — then aggregate this shard's local edge slice with the
    exact single-chip segment-mean numerics (:func:`segment_mean_csr`). The
    transpose is a scatter-add into ``[S*Np, d]`` followed by
    ``all_gather``'s psum_scatter backward, which is precisely the
    feature/projection gradient the table needs."""
    from graphsage_tpu.ops.aggregate import segment_mean_csr

    def spmm(x_local):
        x_full = jax.lax.all_gather(x_local, axis, tiled=True)  # [S*Np, d]
        per_edge = jnp.take(x_full, e_dst, axis=0)
        mean = segment_mean_csr(per_edge, e_src, e_mask, rows_per_shard)
        return mean, deg

    return spmm


def make_sharded_segmax(
    axis: str,
    e_src: jax.Array,  # [Em] LOCAL row index
    e_dst: jax.Array,  # [Em] GLOBAL neighbor id
    e_mask: jax.Array,  # [Em]
    rows_per_shard: int,
):
    """Maxpool counterpart of :func:`make_sharded_spmm` (the ``segmax``
    closure for the sharded layer-0 table): the pooling MLP runs on the
    shard's local rows, the pooled values ``all_gather`` to ``[S*Np, pd]``,
    and the guarded segment-max aggregates this shard's local edge slice —
    the exact single-chip :func:`segment_max_csr` numerics."""
    from graphsage_tpu.ops.aggregate import segment_max_csr

    def segmax(pooled_local):
        pooled_full = jax.lax.all_gather(pooled_local, axis, tiled=True)
        per_edge = jnp.take(pooled_full, e_dst, axis=0)
        agg = segment_max_csr(per_edge, e_src, e_mask, rows_per_shard)
        return agg, None

    return segmax


def local_edges_from_adjacency(
    indptr_local: jax.Array,  # [Np + 1] LOCAL csr offsets
    edge_dst_local: jax.Array,  # [E_max] global neighbor ids
    rows_per_shard: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Derive the COO edge slice the layer-0 closures need from a
    :class:`ShardedAdjacency` shard's local CSR — no second copy of the
    edges on the chip (FullyShardedTrainer's per-chip graph memory stays
    ``E/S`` edges). Returns ``(e_src local rows, e_dst global, e_mask)``."""
    pos = jnp.arange(edge_dst_local.shape[0], dtype=indptr_local.dtype)
    e_src = jnp.clip(
        jnp.searchsorted(indptr_local, pos, side="right") - 1,
        0, rows_per_shard - 1,
    ).astype(jnp.int32)
    e_mask = pos < indptr_local[rows_per_shard]
    return e_src, edge_dst_local, e_mask


def sharded_row_gather(
    axis: str,
    table_local: jax.Array,  # [Np, F] — this chip's node range
    ids_local: jax.Array,  # [...] global node ids requested by this chip
) -> jax.Array:
    """Exact cross-shard row gather (call inside ``shard_map``).

    Returns ``rows[..., F]`` for this chip's requests. See module docstring
    for the exchange pattern and cost.

    A quantized ``table_local`` exchanges int8 partials (+ the 4-byte
    per-row scales) and dequantizes on the requester — the psum_scatter
    sums stay in int8 range because each row has exactly one owner (every
    other partial is a zero row). Not differentiable w.r.t. the table
    (moot: quantized tables are frozen by construction).
    """
    quant = is_quantized(table_local)
    arr = table_local.q if quant else table_local
    np_, f = arr.shape
    flat = ids_local.reshape(-1)
    q = flat.shape[0]
    all_ids = jax.lax.all_gather(flat, axis)  # [S, q] — everyone's requests
    my_first = jax.lax.axis_index(axis) * np_
    loc = all_ids - my_first
    own = (loc >= 0) & (loc < np_)
    idx = jnp.clip(loc, 0, np_ - 1).reshape(-1)

    def exchange(a):
        rows = jnp.take(a, idx, axis=0).reshape(
            all_ids.shape[0], q, a.shape[-1]
        )
        rows = rows * own[..., None].astype(rows.dtype)
        # Chip s gets sum over owners of partial[s] == its own rows, complete.
        return jax.lax.psum_scatter(
            rows, axis, scatter_dimension=0, tiled=False
        )

    mine = exchange(arr)
    if quant:
        mine = mine.astype(jnp.float32) * exchange(table_local.scale)
    return mine.reshape(*ids_local.shape, f)


# Counting-rank bucketing pays O(q·S); the sort pays O(q·log q). At the
# Cora shapes the cumsum wins 2.5x up to S=8 (measured); 32 bounds its
# transient to 128 bytes/request before the sort's S-independence wins.
_RANK_SORT_MIN_SHARDS = 32


class _RouteCtx(NamedTuple):
    """Sort bookkeeping of one request-routing round (static shapes)."""

    # Composed answer-restore index: row i of the original request order
    # lives at flat bucket position take[i] of the answered [S, capacity]
    # array — ONE row gather restores order instead of the two sequential
    # ones (bucket lookup THEN inverse-sort) the naive form pays; gathers
    # are per-row-overhead-bound (docs/ROOFLINE.md §5.1a), so each saved
    # pass is ~10 ns per request row.
    take: jax.Array  # [q] = (sorted_owner * capacity + slot)[inv]
    violated: jax.Array  # [] bool — some bucket overflowed its capacity


def _route_requests(
    axis: str,
    flat_ids: jax.Array,  # [q] global node ids (int32)
    rows_per_shard: int,
    capacity: int,
    valid_mask: jax.Array | None = None,
) -> tuple[jax.Array, _RouteCtx]:
    """Bucket requests by owner into per-pair buckets of static
    ``capacity`` and all_to_all them to their owners. Returns
    ``(recv_req [S, capacity], ctx)`` — ``recv_req[d]`` holds peer ``d``'s
    requests for OUR rows. Masked/padded ids spread round-robin across
    owners so they cannot pile onto shard 0; overflow sets ``ctx.violated``
    (rows would be clipped).

    Bucketing is a counting rank, not a sort, at practical shard counts:
    each request's slot is the number of EARLIER same-owner requests (one
    ``[q, S]`` one-hot cumsum), computed in original order — no argsort /
    searchsorted / inverse permutation. With the composed-index answer
    restore (``_RouteCtx.take``) this took the Cora compact step
    2.50 -> 2.11 ms and the fully sharded step 2.77 -> 2.30 ms on the
    chip, losses bit-identical (docs/ROOFLINE.md §4). The one-hot cumsum
    is O(q·S) work and a ``4·q·S``-byte transient, so above
    ``_RANK_SORT_MIN_SHARDS`` shards the stable-sort formulation
    (O(q log q), S-independent) takes over — both are exact and produce
    identical buckets (stable order)."""
    q = flat_ids.shape[0]
    s = jax.lax.axis_size(axis)
    if valid_mask is not None:
        spread = (jnp.arange(q, dtype=jnp.int32) % s) * rows_per_shard
        flat_ids = jnp.where(valid_mask.reshape(-1), flat_ids, spread)
    owner = (flat_ids // rows_per_shard).astype(jnp.int32)
    if s <= _RANK_SORT_MIN_SHARDS:
        onehot = owner[:, None] == jnp.arange(s, dtype=jnp.int32)[None, :]
        within = jnp.cumsum(onehot.astype(jnp.int32), axis=0)
        rank = jnp.take_along_axis(within, owner[:, None], axis=1)[:, 0] - 1
    else:
        order = jnp.argsort(owner, stable=True)
        sorted_owner = owner[order]
        starts = jnp.searchsorted(
            sorted_owner, jnp.arange(s, dtype=owner.dtype)
        )
        sorted_rank = jnp.arange(q) - starts[sorted_owner]
        rank = jnp.zeros(q, sorted_rank.dtype).at[order].set(sorted_rank)
    violated = (rank >= capacity).any()
    slot = jnp.clip(rank, 0, capacity - 1)
    req = jnp.zeros((s, capacity), jnp.int32).at[owner, slot].set(flat_ids)
    recv_req = jax.lax.all_to_all(
        req[:, :, None], axis, split_axis=0, concat_axis=0, tiled=False
    )[..., 0]
    return recv_req, _RouteCtx(take=owner * capacity + slot,
                               violated=violated)


def _route_answers(axis: str, answers: jax.Array, ctx: _RouteCtx) -> jax.Array:
    """Ship per-request answers ``[S, capacity, ...]`` back to the
    requesters and restore original request order -> ``[q, ...]`` with the
    single composed-index gather (see _RouteCtx.take)."""
    got = jax.lax.all_to_all(
        answers, axis, split_axis=0, concat_axis=0, tiled=False
    )
    s, cap = got.shape[0], got.shape[1]
    return jnp.take(got.reshape(s * cap, *got.shape[2:]), ctx.take, axis=0)


def sharded_row_gather_compact(
    axis: str,
    table_local: jax.Array,  # [Np, F] — this chip's node range
    ids_local: jax.Array,  # [...] global node ids requested by this chip
    capacity: int,
    valid_mask: jax.Array | None = None,
) -> jax.Array:
    """Compact request-routing cross-shard gather (SURVEY §2.3 row 3's
    literal "all-to-all of requested rows").

    Requests sort by owner into per-pair buckets of static ``capacity``;
    one all_to_all ships the ids, owners gather their rows locally, a
    second all_to_all ships the rows back, and the inverse sort restores
    request order. Communication per chip is ``~(S-1)/S * capacity * S * F``
    — about ``S/slack`` times less than the dense psum_scatter form, which
    ships zero rows for everything a chip does not own.

    ``capacity`` must cover the worst per-pair request count. Exactness is
    guarded by the caller (the trainers check overflow each step and abort
    loudly rather than training on clipped rows).

    A quantized ``table_local`` answers with int8 rows plus a second (tiny)
    all_to_all of the 4-byte per-row scales and dequantizes on the
    requester: ``F + 4`` bytes per answered row instead of ``4F`` —
    the full int8 saving lands on the wire, where it matters most.
    """
    quant = is_quantized(table_local)
    arr = table_local.q if quant else table_local
    np_, f = arr.shape
    shape = ids_local.shape
    flat = ids_local.reshape(-1).astype(jnp.int32)
    s = jax.lax.axis_size(axis)
    my_first = jax.lax.axis_index(axis) * np_
    recv_req, ctx = _route_requests(axis, flat, np_, capacity, valid_mask)
    loc = jnp.clip(recv_req.reshape(-1) - my_first, 0, np_ - 1)
    answers = jnp.take(arr, loc, axis=0).reshape(s, capacity, f)
    rows = _route_answers(axis, answers, ctx)
    if quant:
        sc = _route_answers(
            axis,
            jnp.take(table_local.scale, loc, axis=0).reshape(s, capacity, 1),
            ctx,
        )
        rows = rows.astype(jnp.float32) * sc
    return rows.reshape(*shape, f)


def request_capacity(q_local: int, num_shards: int, slack: float = 1.5) -> int:
    """Static per-pair request capacity for the compact exchange."""
    base = -(-q_local // num_shards)
    return _round_up(max(int(base * slack), 8), 8)


def compact_sites(model: GraphSAGE, frontier) -> list:
    """(ids, mask) per feature-table lookup call site of ``model``'s
    forward — mirrors GraphSAGE.forward's branches so the capacity check
    (and the comm-volume report) sees exactly the requests the compact
    exchange will route."""
    L = model.num_layers
    sites = []
    if model.layer0 in ("full", "cached"):
        # One gather from the layer-0 table at the hop layer 1 consumes
        # (forward's layer0="full"/"cached" branches): [N, d0] recomputed
        # per step for "full", the frozen [N, F] aggregate cache for
        # "cached". cached+concat_self adds the raw self-feature gather at
        # the same hop.
        sites = [(frontier.ids[L - 1], frontier.masks[L - 1])]
        if model.layer0 == "cached" and model.concat_self:
            sites.append((frontier.ids[L - 1], frontier.masks[L - 1]))
        return sites
    if model.aggregator == "mean":
        n_out = frontier.ids[L - 1].shape[0]
        # Structural contract with GraphSAGE.sample (round-3 VERDICT item
        # 7): hop L is laid out [n_out, k_eff] row-major with column 0 the
        # parent when concat_self/self_loop — derive k_eff from the model
        # so a future sample() layout change fails loudly at trace time
        # instead of silently mis-slicing the self column.
        k = model.fanouts[0]
        if k is not None:
            k_eff = k + 1 if (model.concat_self or model.self_loop) else k
            if frontier.ids[L].shape[0] != n_out * k_eff:
                raise ValueError(
                    f"frontier hop {L} has {frontier.ids[L].shape[0]} slots "
                    f"but the model's layout (fanout {k}, concat_self="
                    f"{model.concat_self}, self_loop={model.self_loop}) "
                    f"requires {n_out} x {k_eff} — the frontier does not "
                    "come from this model's sample()"
                )
        k_cols = frontier.ids[L].shape[0] // n_out
        ids2 = frontier.ids[L].reshape(n_out, k_cols)
        m2 = frontier.masks[L].reshape(n_out, k_cols)
        if model.concat_self:
            sites.append((ids2[:, 1:], m2[:, 1:]))
            sites.append((frontier.ids[L - 1], frontier.masks[L - 1]))
        else:
            sites.append((ids2, m2))
    else:
        sites.append((frontier.ids[L], frontier.masks[L]))
    return sites


def _frontier_slot_sizes(model: GraphSAGE, b_local: int) -> list[int]:
    """Per-hop frontier slot counts for a ``b_local``-seed shard — the
    static shapes :meth:`GraphSAGE.sample` produces, computed without
    tracing (integer fanouts only)."""
    L = model.num_layers
    hops = L - 1 if model.layer0 in ("full", "cached") else L
    sizes = [b_local]
    for h in range(1, hops + 1):
        k = model.fanouts[L - h]
        if k is None:
            raise ValueError(
                "comm stats need integer fanouts (fanout=None means "
                "full-neighborhood width, which the sharded sampled "
                "trainers do not run)"
            )
        k_eff = k + 1 if (model.concat_self or model.self_loop) else k
        sizes.append(sizes[-1] * k_eff)
    return sizes


def sharded_comm_stats(
    model: GraphSAGE,
    batch_size: int,
    num_shards: int,
    feature_dtype=jnp.float32,
    slack: float = 1.5,
    fully_sharded: bool = False,
    num_nodes: int | None = None,
    layer0_partition=None,
    quantized: bool = False,
) -> dict:
    """Per-chip per-step communication VOLUME (bytes) of the sharded
    trainers, from static shapes alone — the capacity-planning numbers the
    dense/compact docstrings describe, concretely per configuration.

    Reports both exchange modes for the feature gather sites (dense
    ``psum_scatter`` of ``[S, q, row]`` partials vs compact request
    routing) and, with ``fully_sharded=True``, the per-hop distributed
    sampling traffic (ids out, sampled ids + masks back). Row width
    accounts for project-first: when layer 0 projects before aggregating,
    exchanged rows are ``hidden_dims[0]``-wide f32, not feature-wide.
    """
    if batch_size % num_shards:
        raise ValueError("batch_size must be divisible by num_shards")
    s = num_shards
    b_local = batch_size // s
    sizes = _frontier_slot_sizes(model, b_local)
    fr = Frontier(
        ids=tuple(np.zeros(n, np.int32) for n in sizes),
        masks=tuple(np.ones(n, bool) for n in sizes),
    )
    if model.layer0 == "full":
        # The single gather site reads d0-wide layer-0 table rows (in the
        # compute dtype) — F/d0 times less than feature rows.
        table_dtype = model.compute_dtype or feature_dtype
        row_bytes = model.hidden_dims[0] * jnp.dtype(table_dtype).itemsize
    elif model.layer0 == "cached":
        # Gather site(s) read F-wide frozen-aggregate rows. The cache is
        # built in the FEATURE dtype (with_cached_layer0's default — bf16
        # features keep a bf16 cache, f32 stay f32 regardless of
        # compute_dtype); quantized graphs quantize the cache too.
        if quantized:
            row_bytes = model.in_dim + 4
        else:
            row_bytes = model.in_dim * jnp.dtype(feature_dtype).itemsize
    elif model.injected_layer0_project_first(quantized):
        row_bytes = model.hidden_dims[0] * 4  # projected table is f32
    elif quantized:
        row_bytes = model.in_dim + 4  # int8 row + per-row f32 scale
    else:
        row_bytes = model.in_dim * jnp.dtype(feature_dtype).itemsize
    dense = compact = 0
    site_detail = []
    for ids, mask in compact_sites(model, fr):
        q = int(np.prod(ids.shape))
        cap = request_capacity(q, s, slack)
        d = (s - 1) * q * (row_bytes + 4)  # partial rows + id all_gather
        c = (s - 1) * cap * (row_bytes + 4)  # answers back + ids out
        dense += d
        compact += c
        site_detail.append({"q_local": q, "capacity": cap,
                            "dense_bytes": d, "compact_bytes": c})
    out = {
        "num_shards": s,
        "per_chip_frontier_slots": sizes[-1],
        "gather_dense_bytes_per_chip_step": dense,
        "gather_compact_bytes_per_chip_step": compact,
        "gather_compact_vs_dense": dense / max(compact, 1),
        "sites": site_detail,
    }
    if model.layer0 == "full" and num_nodes is not None:
        # Building the local table slice all_gathers each shard's projected
        # [Np, d_proj] rows once per step (forward; the backward
        # psum_scatter moves the same volume again).
        np_ = _round_up(max(-(-num_nodes // s), 1), 8)
        d_proj = (
            model.hidden_dims[0]
            if model.use_project_first(0, model.in_dim)
            else model.in_dim
        )
        itemsize = jnp.dtype(model.compute_dtype or feature_dtype).itemsize
        out["layer0_allgather_bytes_per_chip_step"] = (
            (s - 1) * np_ * d_proj * itemsize
        )
        if layer0_partition is not None:
            # layer0_exchange="halo": boundary rows only, from the
            # equal-node-bounds plan the trainer built.
            rows = layer0_partition.comm_stats()["rows_exchanged_per_shard"]
            out["layer0_halo_bytes_per_chip_step"] = rows * d_proj * itemsize
    if fully_sharded:
        samp = 0
        hop_detail = []
        L = model.num_layers
        hops = L - 1 if model.layer0 in ("full", "cached") else L
        for h in range(1, hops + 1):
            q_h = sizes[h - 1]
            k = model.fanouts[L - h]
            cap = request_capacity(q_h, s, slack)
            # ids out (4B) ; sampled ids (4B * k) + masks (1B * k) back
            v = (s - 1) * cap * (4 + k * 5)
            samp += v
            hop_detail.append({"hop": h, "q_local": q_h, "capacity": cap,
                               "bytes": v})
        out["sampling_bytes_per_chip_step"] = samp
        out["sampling_hops"] = hop_detail
        out["total_compact_bytes_per_chip_step"] = compact + samp
    return out


def hub_request_fraction(degrees, num_hub_rows: int) -> float:
    """Expected fraction of feature-gather requests a ``num_hub_rows``
    frozen hub cache resolves locally — the capacity-planning number for
    lowering ``capacity_slack`` safely.

    Sampled-frontier requests hit node ``v`` in proportion to its degree
    (a uniform neighbor draw lands on ``v`` once per incident edge), so
    the covered fraction is the top-H nodes' share of total degree. On a
    Zipf-ish graph a few hundred rows often cover a large share; the
    residual requests are near-uniform, which is exactly what the
    per-pair capacity formula assumes.
    """
    deg = np.asarray(degrees, np.float64)
    total = deg.sum()
    if total <= 0:
        return 0.0
    h = int(num_hub_rows)
    top = np.sort(deg)[::-1][:h]
    return float(top.sum() / total)


def build_hub_cache(features, degrees, num_hub_rows: int):
    """Frozen hub cache: the ``num_hub_rows`` highest-degree nodes' feature
    rows, replicated on every chip.

    Power-law frontiers request rows proportionally to degree, so a few
    hub rows dominate every chip's request list — they are what overflows
    the compact exchange's per-pair capacity on skewed batches (the
    unsupervised degree^0.75 negatives need slack 4.0 for exactly this
    reason). The feature table is FROZEN (reference model.py:70-71), so
    replicating the hot rows once at build time is exact forever: hub
    requests resolve locally and never enter the routed buckets, bounding
    the residual skew structurally instead of via slack.

    Returns ``(lookup, rows)``: ``lookup[N]`` int32 maps node id -> hub
    rank (or -1), ``rows[H, F]`` carries the cached values in the routed
    gather's output representation (the table dtype; dequantized f32 for
    int8 tables — bit-identical to what the compact exchange would have
    returned). Host numpy in/out; the trainer places both replicated.
    """
    deg = np.asarray(degrees)
    n = deg.shape[0]
    h = int(num_hub_rows)
    if not 0 < h <= n:
        raise ValueError(f"num_hub_rows must be in (0, {n}], got {h}")
    top = np.argsort(-deg, kind="stable")[:h].astype(np.int32)
    lookup = np.full(n, -1, np.int32)
    lookup[top] = np.arange(h, dtype=np.int32)
    if is_quantized(features):
        rows = (
            np.asarray(features.q)[top].astype(np.float32)
            * np.asarray(features.scale)[top]
        )
    else:
        rows = np.asarray(features)[top]
    return lookup, rows


def _hub_wrap_gather_fns(gather_fn, gather_mean_fn, hub):
    """Resolve hub-cached rows locally; only the residual requests route.

    Hub slots enter the routed gather as INVALID (they spread round-robin
    with the padding, never counting toward any owner's bucket), and their
    garbage answers are overwritten from the replicated cache. Exact: the
    cache holds the same values the exchange would return (frozen table).

    The hub path deliberately recomposes the mean as row-gather +
    :func:`masked_mean` instead of delegating to ``gather_mean_fn``
    (which is used only in the no-hub passthrough): cached rows must be
    inserted BEFORE the reduction, and the compact ``gather_mean_fn`` is
    exactly that same composition today (make_sharded_gather_fns) — the
    bit-identical hub/no-hub parity tests pin the equivalence. If a fused
    mean exchange ever lands, route hubs through it there.
    """
    if not hub:
        return gather_fn, gather_mean_fn
    lookup, rows_tab = hub

    def resolve(table_local, ids, valid):
        rank = jnp.take(lookup, ids, axis=0)
        is_hub = rank >= 0
        routed = gather_fn(
            table_local, ids, valid & ~is_hub if valid is not None
            else ~is_hub,
        )
        cached = jnp.take(rows_tab, jnp.clip(rank, 0), axis=0)
        return jnp.where(is_hub[..., None], cached.astype(routed.dtype),
                         routed)

    def hub_gather(table_local, ids, mask=None):
        return resolve(table_local, ids, mask)

    def hub_gather_mean(table_local, ids, mask):
        return masked_mean(resolve(table_local, ids, mask), mask)

    return hub_gather, hub_gather_mean


def make_sharded_gather_fns(
    axis: str,
    mode: str = "dense",
    num_shards: int | None = None,
    slack: float = 1.5,
):
    """(gather_fn, gather_mean_fn) closures for GraphSAGE.forward where the
    feature/projection table argument is the chip's LOCAL node-range shard.

    ``mode="dense"`` — exact for any id distribution (psum_scatter).
    ``mode="compact"`` — request-routing all_to_all; each call site's
    per-pair capacity derives from its static request count
    (:func:`request_capacity` with ``slack``)."""
    if mode == "dense":
        def gather_fn(table_local, ids, mask=None):
            return sharded_row_gather(axis, table_local, ids)

        def gather_mean_fn(table_local, ids, mask):
            rows = sharded_row_gather(axis, table_local, ids)
            return masked_mean(rows, mask)
    elif mode == "compact":
        if num_shards is None:
            raise ValueError("compact mode requires num_shards")

        def gather_fn(table_local, ids, mask=None):
            cap = request_capacity(int(np.prod(ids.shape)), num_shards, slack)
            return sharded_row_gather_compact(
                axis, table_local, ids, cap, valid_mask=mask
            )

        def gather_mean_fn(table_local, ids, mask):
            cap = request_capacity(int(np.prod(ids.shape)), num_shards, slack)
            rows = sharded_row_gather_compact(
                axis, table_local, ids, cap, valid_mask=mask
            )
            return masked_mean(rows, mask)
    else:
        raise ValueError(f"unknown sharded gather mode {mode!r}")

    return gather_fn, gather_mean_fn


class ShardedFeatureTrainer(Trainer):
    """Sampled-minibatch trainer whose feature table is node-sharded.

    One mesh axis (default ``"data"``) carries both data parallelism (seed
    batch split) and the node-sharded feature store; adjacency and labels
    replicate (index data, ~4 B/edge — the payload is the feature table).
    The training step runs inside one ``shard_map``: per-shard forward with
    the cross-shard layer-0 gather, local loss, per-shard grads, gradient
    psum. Matches the single-device :class:`~graphsage_tpu.train.trainer.
    Trainer` step bit-for-math (same keys => same frontiers; allclose-pinned
    in tests/test_feature_store.py).

    **Memory:** pass a HOST graph (``build_graph(..., placement="host")``)
    and after init no device buffer of the full ``[N, F]`` table exists —
    the host table is sliced in numpy and each chip receives only its
    ``N/S`` rows (asserted against ``jax.live_arrays()`` in
    tests/test_feature_store.py). A device graph also works (back-compat)
    but its resident full table defeats the accounting. With
    ``eval_fanouts`` set, sampled eval runs through the same sharded
    gather; the ``eval_fanouts=None`` fallback builds a TRANSIENT device
    copy of the full graph for the deterministic full-neighborhood forward
    and frees it on return.

    ``layer0="full"`` is supported: the shared-table layer 0 runs
    distributed (each chip builds its local ``[Np, d0]`` table slice over
    its own edge slice) and the single remaining gather site exchanges
    d0-wide table rows — see :func:`make_sharded_spmm` and
    :func:`sharded_comm_stats`. ``layer0_exchange`` picks how the table
    build moves rows: ``"allgather"`` (every shard's projected rows, one
    all_gather — simple, (S-1)·Np·d rows/chip) or ``"halo"`` (the
    boundary-rows-only halo plan over ``bounds="equal_nodes"`` — the
    feature store's own ownership rule — typically far less traffic;
    ``layer0_halo_kwargs`` forwards ``sizing``/``hub_threshold``/
    ``halo_chunks`` to :func:`~graphsage_tpu.parallel.halo.build_node_partition`).
    """

    # FullyShardedTrainer derives the layer-0 edge slice from its sharded
    # adjacency instead of a second host-side split (no duplicate edges).
    _layer0_edges_from_adjacency = False

    def __init__(
        self,
        model: GraphSAGE,
        graph: Graph,
        config,
        mesh: Mesh,
        axis: str = "data",
        gather_mode: str = "dense",
        capacity_slack: float = 1.5,
        layer0_exchange: str = "allgather",
        layer0_halo_kwargs: dict | None = None,
        feature_store: NodeShardedFeatures | None = None,
        hub_cache_rows: int = 0,
    ):
        if gather_mode not in ("dense", "compact"):
            raise ValueError(f"unknown gather_mode {gather_mode!r}")
        if layer0_exchange not in ("allgather", "halo"):
            raise ValueError(f"unknown layer0_exchange {layer0_exchange!r}")
        if layer0_exchange == "halo" and self._layer0_edges_from_adjacency:
            raise ValueError(
                "layer0_exchange='halo' is ShardedFeatureTrainer-only: the "
                "halo plan is a second edge copy, which FullyShardedTrainer "
                "exists to avoid (it derives layer-0 edges from its sharded "
                "adjacency)"
            )
        self.layer0_exchange = layer0_exchange
        self.mesh = mesh
        self.axis = axis
        self.gather_mode = gather_mode
        self.capacity_slack = capacity_slack
        s = mesh.shape[axis]
        if config.batch_size % s:
            raise ValueError(
                f"batch_size {config.batch_size} must be divisible by the "
                f"{axis!r} axis size {s}"
            )
        if model.layer0 == "cached" and graph.layer0_cache is None:
            # One-time frozen-aggregate build (exact — quirk Q12 + mean
            # linearity), done here so the cache shards below come from the
            # same host build the single-device trainer would use. Quantized
            # graphs quantize the cache too (same capacity story, and the
            # cross-shard exchange then ships int8 rows + scales).
            if feature_store is not None:
                raise ValueError(
                    "layer0='cached' needs the full feature table to build "
                    "the aggregate cache, but this trainer was given a "
                    "loader feature_store (no host ever held the full "
                    "[N, F] array) — precompute the cache offline and "
                    "attach it to the graph, or use layer0='sampled'"
                )
            from graphsage_tpu.data.graph import with_cached_layer0

            graph = with_cached_layer0(
                graph, self_loop=model.self_loop,
                quantize=is_quantized(graph.features),
            )
        elif model.layer0 == "cached" and bool(
            graph.layer0_cache_self_loop
        ) != bool(model.self_loop):
            # A pre-built cache bypasses forward's flavor check (the table
            # is injected via _layer0_table_fn, not read off the graph) —
            # validate here or train silently with wrong-flavor aggregates.
            raise ValueError(
                "graph.layer0_cache was built with self_loop="
                f"{graph.layer0_cache_self_loop} but the model has "
                f"self_loop={model.self_loop} — rebuild the cache with the "
                "matching flavor"
            )
        # The source graph (host numpy or device) feeds the host-side
        # sharding splits and the transient full-graph eval fallback; the
        # resident device payload is whatever _place_graph keeps.
        self._source_graph = graph
        self._shard_sharding = NamedSharding(mesh, P(axis))
        self._repl = NamedSharding(mesh, P())
        super().__init__(model, graph, config)
        self._graph_nofeat = self.graph  # adjacency + labels, no feature table
        if feature_store is not None:
            # Pre-built store (e.g. shard_features_from_loader — pod-scale
            # ingestion where no host ever materialized the full table).
            # The graph's own feature leaf is then only a shape/dtype
            # descriptor (load_cora_lazy ships a zero-strided view), so the
            # eval_fanouts=None full-graph fallback is unavailable.
            if feature_store.num_nodes != graph.num_nodes:
                raise ValueError(
                    f"feature_store covers {feature_store.num_nodes} nodes, "
                    f"graph has {graph.num_nodes}"
                )
            if feature_store.num_shards != s:
                raise ValueError(
                    f"feature_store has {feature_store.num_shards} shards, "
                    f"mesh axis {axis!r} has {s}"
                )
            if config.eval_fanouts is None:
                # Fail at construction, not after the last training step:
                # run() unconditionally ends in evaluate(), whose
                # eval_fanouts=None path needs the full table this trainer
                # does not have — the whole run's work would be lost to the
                # raise.
                raise ValueError(
                    "feature_store trainers have no full feature table, so "
                    "the eval_fanouts=None full-graph eval cannot run — set "
                    "TrainConfig(eval_fanouts=...) to evaluate through the "
                    "sharded gather"
                )
            self.features = feature_store
        else:
            self.features = shard_features(
                graph.features, s, sharding=self._shard_sharding
            )
        self._external_store = feature_store is not None
        self.feature_shards = self.features.shards
        # layer0="full": the shared-table layer 0 runs DISTRIBUTED — each
        # chip aggregates its node range's edges over the all_gathered
        # (projected) rows, producing the LOCAL [Np, d0] table slice that
        # the cross-shard gather then serves d0-wide rows from. The edge
        # slices shard with the same ownership rule as the features.
        # (FullyShardedTrainer derives them from its sharded adjacency
        # instead — no second edge copy on the chip.)
        self._layer0_part = None
        if model.layer0 == "full" and self.layer0_exchange == "halo":
            # Boundary-rows-only table build: the halo plan over the
            # feature store's OWN ownership rule (equal node ranges) —
            # the payload rides the edge_slice_leaves slot.
            from graphsage_tpu.parallel.halo import (
                _exchange_arrays,
                build_node_partition,
            )

            part = build_node_partition(
                graph, s, bounds="equal_nodes",
                **(layer0_halo_kwargs or {}),
            )
            assert part.nodes_per_shard == self.features.rows_per_shard
            self._layer0_part = part
            self.edge_slices = None
            self.edge_slice_leaves = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, self._shard_sharding),
                _exchange_arrays(part),
            )
        elif model.layer0 == "full" and not self._layer0_edges_from_adjacency:
            self.edge_slices = shard_edge_slices(
                graph, s, sharding=self._shard_sharding
            )
            self.edge_slice_leaves = self.edge_slices.leaves
        elif model.layer0 == "cached":
            # The frozen aggregate table shards exactly like the features
            # (same node-range ownership rule => same row padding, which the
            # owner arithmetic of the gather exchange relies on). The shard
            # stack rides the edge_slice_leaves payload slot, like the halo
            # plan does.
            self.edge_slices = None
            self._cache_store = shard_features(
                graph.layer0_cache, s, sharding=self._shard_sharding
            )
            assert (
                self._cache_store.rows_per_shard == self.features.rows_per_shard
            )
            self._cache_quantized = is_quantized(self._cache_store.shards)
            self.edge_slice_leaves = tuple(
                jax.tree_util.tree_leaves(self._cache_store.shards)
            )
        else:
            self.edge_slices = None
            self.edge_slice_leaves = ()
        # Frozen hub cache (round 4): replicate the top-degree rows so
        # hub-skewed requests resolve locally instead of overflowing
        # compact buckets (see build_hub_cache). Only valid where gathers
        # read the RAW frozen table — project-first and layer0="full"
        # gather from params-DEPENDENT tables a frozen cache cannot track.
        self.hub_cache_rows = int(hub_cache_rows)
        if self.hub_cache_rows:
            if gather_mode != "compact":
                raise ValueError(
                    "hub_cache_rows only affects the compact exchange "
                    "(the dense psum_scatter is exact for any skew)"
                )
            if self._external_store:
                raise ValueError(
                    "hub_cache_rows needs the full feature table; this "
                    "trainer was built from a loader feature_store"
                )
            if model.layer0 == "full" or (
                model.layer0 != "cached"
                and model.injected_layer0_project_first(
                    is_quantized(self._source_graph.features)
                )
            ):
                raise ValueError(
                    "hub_cache_rows requires a frozen gather table: the "
                    "injected project-first and layer0='full' modes gather "
                    "from params-DEPENDENT tables a frozen hub cache "
                    "cannot track (set project_first=False or skip the "
                    "cache)"
                )
            if model.layer0 == "cached":
                # The aggregate cache is frozen too, so hub rows come from
                # IT — exact for the same reason the feature hub is. Only
                # the pure-mean mode: concat_self adds a second (raw
                # self-feature) gather site through the SAME exchange
                # closure, which one hub table would answer wrongly.
                if model.concat_self:
                    raise ValueError(
                        "hub_cache_rows with layer0='cached' supports the "
                        "pure-mean mode only: concat_self adds a raw "
                        "self-feature gather site that shares the exchange "
                        "closure with the cache-row site — one hub table "
                        "cannot serve both (drop concat_self or the cache)"
                    )
                if is_quantized(self._source_graph.layer0_cache):
                    raise ValueError(
                        "hub_cache_rows with a QUANTIZED layer0 cache is "
                        "unsupported (hub rows would need their own scale "
                        "plumbing) — build the cache unquantized or skip "
                        "the hub cache"
                    )
                hub_table = self._source_graph.layer0_cache
            else:
                hub_table = self._source_graph.features
            lookup, rows = build_hub_cache(
                hub_table, self._source_graph.degrees, self.hub_cache_rows,
            )
            self.hub_leaves = (
                jax.device_put(jnp.asarray(lookup), self._repl),
                jax.device_put(jnp.asarray(rows), self._repl),
            )
        else:
            self.hub_leaves = ()
        # Jitted steps cache, keyed by capacity slack (a static trace
        # constant): the overflow retry ladder recompiles at doubled slack
        # instead of killing the run (round-3 VERDICT item 4).
        self._jit_steps: dict = {}

    def _place_graph(self, graph):
        """Device payload: adjacency + labels (replicated — index data, ~4
        B/edge). The feature leaf becomes a 1-row placeholder so no device
        ever holds the full ``[N, F]`` table; the sharded store is the only
        feature payload."""
        feats = graph.features
        blanked = graph.replace(
            features=np.zeros((1, graph.num_features), dtype=feats.dtype),
            # The cached layer-0 table is graph-sized too — it lives ONLY in
            # the sharded store built in __init__, never replicated.
            layer0_cache=None,
        )
        return blanked.to_device()

    # --------------------------------------------------------------- compact
    def _compact_sites(self, frontier, model=None):
        """See :func:`compact_sites`; ``model`` overrides self.model (eval
        uses different fanouts)."""
        return compact_sites(model if model is not None else self.model, frontier)

    def _local_sites_violated(self, frontier, model=None, slack=None,
                              hub_lookup=None):
        """True when any table-lookup call site of THIS shard's frontier
        exceeds its static compact capacity (rows would clip => abort).
        Call inside shard_map with the shard-local frontier — the sites and
        the mask-spread handling mirror the compact gather fns exactly
        (``_compact_sites`` is the single source of both). ``slack``
        overrides the trainer's capacity_slack (eval retries recompile at a
        larger slack); ``hub_lookup`` excludes hub-cached requests exactly
        as ``_hub_wrap_gather_fns`` masks them out of routing."""
        s = self.mesh.shape[self.axis]
        np_ = self.features.rows_per_shard
        slack = self.capacity_slack if slack is None else slack
        violated = jnp.zeros((), bool)
        for ids, mask in self._compact_sites(frontier, model):
            q_l = ids.size
            cap = request_capacity(q_l, s, slack)
            flat = ids.reshape(-1).astype(jnp.int32)
            valid = None if mask is None else mask.reshape(-1)
            if hub_lookup is not None:
                not_hub = jnp.take(hub_lookup, flat, axis=0) < 0
                valid = not_hub if valid is None else valid & not_hub
            if valid is not None:
                spread = (jnp.arange(q_l, dtype=jnp.int32) % s) * np_
                flat = jnp.where(valid, flat, spread)
            owner = flat // np_
            cnt = (owner[:, None] == jnp.arange(s)[None, :]).sum(axis=0)
            violated = violated | (cnt.max() > cap)
        return violated

    # --------------------------------------------------- layer-0 full table
    def _layer0_table_fn(self, payload_local):
        """``(params, feats_local) -> local [Np, d0] table slice`` closure
        for ``layer0="full"`` (None otherwise). ``payload_local`` is the
        shard-local slice of ``edge_slice_leaves`` (leaves keep their
        leading ``[1, ...]`` dim) — call inside shard_map. The table math
        lives in :meth:`GraphSAGE.layer0_full_table`; only the spmm/segmax
        closure differs (all_gather + local edge slice, or the halo
        boundary exchange)."""
        model = self.model
        if model.layer0 == "cached":
            # Params-independent: the payload IS the local table slice.
            return self._cache_table_fn(tuple(a[0] for a in payload_local))
        if model.layer0 != "full":
            return None
        if self.layer0_exchange == "halo":
            from graphsage_tpu.parallel.halo import (
                halo_segment_max,
                halo_spmm_mean,
            )

            part = self._layer0_part
            if model.aggregator == "mean":
                def spmm(x):
                    mean, cnt = halo_spmm_mean(
                        self.axis, part, x[None], payload_local
                    )
                    return mean[0], cnt[0]

                return lambda p, feats: model.layer0_full_table(
                    p, feats, spmm=spmm
                )

            def segmax(pooled):
                agg, cnt = halo_segment_max(
                    self.axis, part, pooled[None], payload_local
                )
                return agg[0], cnt[0]

            return lambda p, feats: model.layer0_full_table(
                p, feats, segmax=segmax
            )
        return self._layer0_table_fn_slices(
            tuple(a[0] for a in payload_local)
        )

    def _layer0_table_fn_slices(self, edge_local):
        """All_gather-exchange variant: ``edge_local`` is this shard's
        ``(e_src, e_dst, e_mask, deg)`` with leading dims stripped."""
        model = self.model
        np_ = self.features.rows_per_shard
        e_src, e_dst, e_mask, deg = edge_local
        if model.aggregator == "mean":
            spmm = make_sharded_spmm(
                self.axis, e_src, e_dst, e_mask, deg, np_
            )
            return lambda p, feats: model.layer0_full_table(p, feats, spmm=spmm)
        segmax = make_sharded_segmax(self.axis, e_src, e_dst, e_mask, np_)
        return lambda p, feats: model.layer0_full_table(p, feats, segmax=segmax)

    # ------------------------------------------------------------------ step
    def _sharded_step(self, state, feature_shards, hub, graph, edge_leaves,
                      seeds, slack=None):
        model = self.model
        axis = self.axis
        slack = self.capacity_slack if slack is None else slack
        next_key, sample_key = jax.random.split(state.key)
        # Replicated sampling: identical math to the single-device step.
        frontier = model.sample(sample_key, graph, seeds)
        labels = jnp.take(graph.labels, seeds, axis=0)
        gather_fn, gather_mean_fn = make_sharded_gather_fns(
            axis, mode=self.gather_mode,
            num_shards=self.mesh.shape[axis], slack=slack,
        )

        def shard_step(params, shard, hub_l, edge_local, f_ids, f_masks,
                       labels_local):
            shard_l = _lead0(shard)
            local = Frontier(ids=f_ids, masks=f_masks)
            g_fn, gm_fn = _hub_wrap_gather_fns(gather_fn, gather_mean_fn,
                                               hub_l)
            violated = (
                self._local_sites_violated(
                    local, slack=slack,
                    hub_lookup=hub_l[0] if hub_l else None,
                )
                if self.gather_mode == "compact"
                else jnp.zeros((), bool)
            )
            table_fn = (
                self._layer0_table_fn(edge_local)
                if model.layer0 in ("full", "cached")
                else None
            )

            def loss_fn(p):
                return model.loss(
                    p, shard_l, local, labels_local,
                    gather_fn=g_fn, gather_mean_fn=gm_fn,
                    layer0_table=(
                        table_fn(p, shard_l) if table_fn is not None else None
                    ),
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            # Local loss is a mean over B/S seeds: the global batch mean (and
            # its gradient) is the psum of per-shard means divided by S.
            s = jax.lax.axis_size(axis)
            loss = jax.lax.psum(loss, axis) / s
            grads = jax.tree_util.tree_map(
                lambda t: jax.lax.psum(t, axis) / s, grads
            )
            violated_any = jax.lax.psum(violated.astype(jnp.int32), axis) > 0
            return loss, grads, violated_any

        loss, grads, violated = shard_map(
            shard_step,
            mesh=self.mesh,
            in_specs=(
                P(), P(axis), P(),
                (P(axis),) * len(edge_leaves),
                (P(axis),) * len(frontier.ids),
                (P(axis),) * len(frontier.masks),
                P(axis),
            ),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )(state.params, feature_shards, hub, edge_leaves,
          frontier.ids, frontier.masks, labels)

        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, key=next_key,
            step=state.step + 1,
        )
        return _guard_state_update(violated, state, new_state), loss, violated

    def _block_payload(self):
        # Shard stack + hub cache + no-feature graph + layer-0 edge slices
        # as jit ARGS (never closure constants — see Trainer._block_payload).
        return (self.feature_shards, self.hub_leaves, self._graph_nofeat,
                self.edge_slice_leaves)

    def _train_block(self, state, payload, seeds_all):
        """Scanned block dispatch over the SHARDED step (the inherited block
        would fall back to the replicated-table step). ``payload`` is
        ``(feature_shards, hub_leaves, graph_nofeat, edge_slice_leaves)``
        from ``_block_payload``.

        Capacity violations ride out as the per-step bool lane; a violated
        step is a NO-OP on the carried state (``_guard_state_update``), so
        ``run()`` warns with the violated indices and redoes those batches
        through the doubled-slack retry ladder instead of aborting (only
        ladder exhaustion raises). A violated slot's recorded loss is the
        clipped-rows value until the redo overwrites it.
        """
        feature_shards, hub, graph, edge_leaves = payload

        def body(st, seeds):
            st, loss, violated = self._sharded_step(
                st, feature_shards, hub, graph, edge_leaves, seeds
            )
            return st, (loss, violated)

        state, (losses, violated) = jax.lax.scan(body, state, seeds_all)
        return state, losses, violated

    # ------------------------------------------------------------------ eval
    def _eval_logits_sharded(self, params, feature_shards, hub, graph,
                             edge_leaves, seeds, mode=None,
                             return_embeddings: bool = False):
        """Sampled eval logits through the node-sharded gather (same
        machinery as the training step — hub cache included, so a skewed
        eval batch benefits from the same structural bound training does;
        fixed key — the reference's sampled-eval observable without
        replicating the table). ``mode`` overrides the trainer's gather
        mode (the dense fallback path); ``return_embeddings`` yields the
        pre-head rows instead (the unsupervised probe's input)."""
        import dataclasses as _dc

        mode = mode or self.gather_mode
        fanouts = self.cfg.eval_fanouts or self.model.fanouts
        model = _dc.replace(self.model, fanouts=tuple(fanouts))
        frontier = model.sample(
            jax.random.PRNGKey(self.cfg.seed + 7), graph, seeds
        )
        gather_fn, gather_mean_fn = make_sharded_gather_fns(
            self.axis, mode=mode,
            num_shards=self.mesh.shape[self.axis], slack=self.capacity_slack,
        )

        def shard_fwd(params, shard, hub_l, edge_local, f_ids, f_masks):
            shard_l = _lead0(shard)
            local = Frontier(ids=f_ids, masks=f_masks)
            g_fn, gm_fn = _hub_wrap_gather_fns(gather_fn, gather_mean_fn,
                                               hub_l)
            violated = (
                self._local_sites_violated(
                    local, model,  # eval fanouts
                    hub_lookup=hub_l[0] if hub_l else None,
                )
                if mode == "compact"
                else jnp.zeros((), bool)
            )
            table_fn = (
                self._layer0_table_fn(edge_local)
                if model.layer0 in ("full", "cached")
                else None
            )
            logits = model.forward(
                params, shard_l, local,
                gather_fn=g_fn, gather_mean_fn=gm_fn,
                return_embeddings=return_embeddings,
                layer0_table=(
                    table_fn(params, shard_l)
                    if table_fn is not None
                    else None
                ),
            )
            violated = jax.lax.psum(
                violated.astype(jnp.int32), self.axis
            ) > 0
            return logits, violated

        return shard_map(
            shard_fwd,
            mesh=self.mesh,
            in_specs=(
                P(), P(self.axis), P(),
                (P(self.axis),) * len(edge_leaves),
                (P(self.axis),) * len(frontier.ids),
                (P(self.axis),) * len(frontier.masks),
            ),
            out_specs=(P(self.axis), P()),
            check_vma=False,
        )(params, feature_shards, hub, edge_leaves,
          frontier.ids, frontier.masks)

    def predict(self, state, nodes):
        """Sampled eval stays node-sharded when ``eval_fanouts`` is set;
        otherwise falls back to the deterministic full-graph forward on a
        TRANSIENT device copy of the source graph (placed for this call,
        freed on return — no resident full table; fine for
        validation-sized calls; documented trade)."""
        if self.cfg.eval_fanouts is None:
            self._require_full_table("the eval_fanouts=None full-graph eval")
            nodes = np.asarray(nodes)
            g = (
                self._source_graph.to_device()
                if self._source_graph.on_host
                else self._source_graph
            )
            logits = self._jit_full_logits(state.params, g)
            return self.model.predictions(logits)[nodes]
        nodes = np.asarray(nodes)
        s = self.mesh.shape[self.axis]
        pad = (-len(nodes)) % s
        seeds = np.concatenate([nodes, np.zeros(pad, nodes.dtype)])
        if self._jit_eval_logits is None:
            self._jit_eval_logits = jax.jit(self._eval_logits_sharded)
            self._jit_eval_logits_dense = None
        seeds_dev = jax.device_put(jnp.asarray(seeds, jnp.int32), self._repl)
        logits, violated = self._jit_eval_logits(
            state.params, self.feature_shards, self.hub_leaves,
            self._graph_nofeat, self.edge_slice_leaves, seeds_dev,
        )
        if bool(violated):
            # Never fail a finished run over an eval-frontier shape: redo
            # this batch through the DENSE exchange (exact for any id
            # distribution) and tell the user to raise capacity_slack.
            import functools as _ft
            import warnings

            warnings.warn(
                "compact sharded-gather capacity exceeded during eval; "
                "falling back to the dense exchange for this batch — "
                "increase capacity_slack to keep eval on the compact path"
            )
            if self._jit_eval_logits_dense is None:
                self._jit_eval_logits_dense = jax.jit(
                    _ft.partial(self._eval_logits_sharded, mode="dense")
                )
            logits, _ = self._jit_eval_logits_dense(
                state.params, self.feature_shards, self.hub_leaves,
                self._graph_nofeat, self.edge_slice_leaves, seeds_dev,
            )
        return self.model.predictions(logits)[: len(nodes)]

    def _require_full_table(self, what: str) -> None:
        """Loader-built stores (shard_features_from_loader) have no full
        host feature table anywhere — the source graph's feature leaf is a
        descriptor, and silently running ``what`` on it would produce
        garbage predictions, not an error."""
        if getattr(self, "_external_store", False):
            raise ValueError(
                f"{what} needs the full feature table, but this trainer "
                "was built from a feature_store (no host ever held the "
                "full [N, F] array); set eval_fanouts to evaluate through "
                "the sharded gather instead"
            )

    # ----------------------------------------------------------------- api
    # Overflow retry ladder: capacity_slack * 2**i for i < _SLACK_RETRIES
    # (same 8x ceiling as the eval retries).
    _SLACK_RETRIES = 4

    def _step_impl(self, state, *args, slack=None):
        """The slack-parameterized step this trainer's retry ladder jits —
        subclasses point it at their own step fn (dynamic dispatch keeps
        the unsupervised overrides on the same ladder)."""
        return self._sharded_step(state, *args, slack=slack)

    def _step_call_args(self, seeds):
        """Positional args after ``state`` for ``_step_impl``, with the
        (device-placed) seeds in this trainer's slot."""
        return (self.feature_shards, self.hub_leaves, self._graph_nofeat,
                self.edge_slice_leaves, seeds)

    def _get_jit_step(self, slack: float):
        fn = self._jit_steps.get(slack)
        if fn is None:
            fn = jax.jit(
                functools.partial(self._step_impl, slack=slack),
                donate_argnums=(0,),
            )
            self._jit_steps[slack] = fn
        return fn

    def step(self, state, seeds):
        """One training step with the capacity-overflow retry policy.

        A violated step is a NO-OP on the state (``_guard_state_update``),
        so on overflow the SAME batch is redone at doubled slack — a
        recompile, never a silent clip and never a lost run — up to
        ``2**(_SLACK_RETRIES-1)``x the configured slack; only then raise.
        Dense-mode gathers have no capacity, so the first call always
        returns there.
        """
        import warnings

        seeds = jax.device_put(jnp.asarray(seeds, jnp.int32), self._repl)
        slacks = [
            float(self.capacity_slack) * (2.0 ** i)
            for i in range(self._SLACK_RETRIES)
        ]
        for i, slack in enumerate(slacks):
            state, loss, violated = self._get_jit_step(slack)(
                state, *self._step_call_args(seeds)
            )
            if not bool(violated):
                return state, loss
            if i + 1 < len(slacks):
                warnings.warn(
                    "sharded request capacity exceeded at "
                    f"slack={slack} (step NOT applied); redoing the same "
                    f"batch with slack={slacks[i + 1]} — a recompile; set "
                    "capacity_slack higher to avoid it"
                )
        raise ValueError(
            "sharded request capacity still exceeded after retries up to "
            f"slack={slacks[-1]}: a per-pair request bucket overflowed "
            "(rows would be clipped). Raise capacity_slack explicitly "
            "(ShardedFeatureTrainer alternatively supports "
            "gather_mode='dense'; the fully sharded trainer is "
            "compact-only)."
        )

    def _cache_table_fn(self, leaves):
        """``layer0="cached"`` table closure from this shard's cache-store
        leaves — THE place that encodes the payload leaf order (one dense
        ``[Np, F]`` leaf, or the QuantizedTable ``(q, scale)`` pair). Both
        trainer tiers reconstruct through here so a layout change cannot
        silently mis-assemble the table in only one of them."""
        table = (
            QuantizedTable(*leaves) if self._cache_quantized else leaves[0]
        )
        return lambda p, feats: table

    def memory_stats(self) -> dict:
        """Theoretical per-chip layout PLUS measured live device bytes
        (``jax.live_arrays()``) — the claim and the machine's answer side
        by side. ``measured_largest_buffer_bytes`` below the full-table
        byte count is the proof that no chip holds a whole ``[N, F]``
        copy."""
        from graphsage_tpu.utils.memory import live_device_bytes

        measured = live_device_bytes()
        hub_bytes = sum(
            int(np.prod(a.shape)) * a.dtype.itemsize for a in self.hub_leaves
        )
        stats = {
            **self.features.memory_stats(),
            "hub_cache_rows": self.hub_cache_rows,
            "hub_cache_bytes_per_chip": hub_bytes,
            "measured_total_device_bytes": measured["total_bytes"],
            "measured_largest_buffer_bytes": measured["largest_buffer_bytes"],
            "measured_per_device_bytes": measured["per_device_bytes"],
        }
        if getattr(self, "_cache_store", None) is not None:
            # layer0="cached": the frozen-aggregate shard store is a second
            # graph-sized per-chip table — count it or the claimed per-chip
            # residency understates ~2x (docs/DISTRIBUTED.md points users
            # here for capacity planning).
            cm = self._cache_store.memory_stats()
            stats["layer0_cache_bytes_per_chip"] = cm["feature_bytes_per_chip"]
            stats["feature_bytes_per_chip"] += cm["feature_bytes_per_chip"]
            stats["feature_bytes_replicated"] += cm["feature_bytes_replicated"]
        return stats


# ---------------------------------------------------------------------------
# Fully sharded sampled training: adjacency sharded too, with DISTRIBUTED
# neighbor sampling (each hop routes frontier ids to their owner shard,
# which samples locally and ships the sampled neighbor ids back). Nothing
# per-graph is replicated: adjacency is E/S edges per chip, features
# N/S * F, the batch B/S — the FastSample-style layout for graphs whose
# adjacency alone exceeds one chip's memory.
# ---------------------------------------------------------------------------


@struct.dataclass
class ShardedAdjacency:
    """Per-shard adjacency: each chip owns its node range's ELL rows and
    (complete) local CSR slice. Neighbor ids stay GLOBAL — sampling returns
    global ids ready for the next routing hop."""

    ell: jax.Array  # [S, Np, W] global neighbor ids (0-padded)
    degrees: jax.Array  # [S, Np] true degrees
    indptr: jax.Array  # [S, Np + 1] LOCAL csr offsets
    edge_dst: jax.Array  # [S, E_max] global neighbor ids per local edge
    num_shards: int = struct.field(pytree_node=False)
    rows_per_shard: int = struct.field(pytree_node=False)
    ell_covers_all: bool = struct.field(pytree_node=False)

    def memory_stats(self) -> dict:
        per_chip = sum(
            int(np.prod(a.shape[1:])) * jnp.dtype(a.dtype).itemsize
            for a in (self.ell, self.degrees, self.indptr, self.edge_dst)
        )
        replicated = per_chip * self.num_shards  # upper bound (padding)
        return {
            "adjacency_bytes_per_chip": per_chip,
            "adjacency_bytes_replicated_approx": replicated,
        }


def shard_adjacency(
    graph: Graph, num_shards: int, sharding=None
) -> ShardedAdjacency:
    """Split the graph's ELL + CSR views into equal node-range shards
    (host-side; same ownership rule as :func:`shard_features`).
    ``sharding`` places arrays directly in the sharded layout."""
    ell = np.asarray(graph.neighbors)
    deg = np.asarray(graph.degrees)
    indptr = np.asarray(graph.indptr).astype(np.int64)
    edge_dst = np.asarray(graph.edge_dst)
    n = graph.num_nodes
    rows = _round_up(max(-(-n // num_shards), 1), 8)
    w = ell.shape[1]
    e_max = 0
    for s in range(num_shards):
        lo, hi = min(s * rows, n), min(s * rows + rows, n)
        e_max = max(e_max, int(indptr[hi] - indptr[lo]))
    e_max = _round_up(max(e_max, 1), 128)

    ell_s = np.zeros((num_shards, rows, w), np.int32)
    deg_s = np.zeros((num_shards, rows), np.int32)
    ind_s = np.zeros((num_shards, rows + 1), np.int32)
    dst_s = np.zeros((num_shards, e_max), np.int32)
    for s in range(num_shards):
        lo, hi = min(s * rows, n), min(s * rows + rows, n)
        sz = hi - lo
        ell_s[s, :sz] = ell[lo:hi]
        deg_s[s, :sz] = deg[lo:hi]
        local = indptr[lo : hi + 1] - indptr[lo]
        ind_s[s, : sz + 1] = local
        ind_s[s, sz + 1 :] = local[-1] if sz else 0
        e = int(indptr[hi] - indptr[lo])
        dst_s[s, :e] = edge_dst[indptr[lo] : indptr[hi]]
    place = (
        (lambda a: jax.device_put(a, sharding))
        if sharding is not None
        else jnp.asarray
    )
    return ShardedAdjacency(
        ell=place(ell_s),
        degrees=place(deg_s),
        indptr=place(ind_s),
        edge_dst=place(dst_s),
        num_shards=num_shards,
        rows_per_shard=rows,
        ell_covers_all=graph.ell_covers_all,
    )


def sharded_sample_neighbors(
    axis: str,
    adj: ShardedAdjacency,
    ell_local: jax.Array,  # [Np, W]
    deg_local: jax.Array,  # [Np]
    indptr_local: jax.Array,  # [Np + 1]
    edge_dst_local: jax.Array,  # [E_max]
    ids: jax.Array,  # [q] global parent ids (this chip's frontier slice)
    fanout: int | None,
    key: jax.Array,
    capacity: int,
    valid_mask: jax.Array | None = None,
    method: str = "floyd",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One DISTRIBUTED sampling hop (call inside shard_map): frontier ids
    route to their owner shard, the owner runs the vectorized sampler over
    its local ELL/CSR tables, and the sampled GLOBAL neighbor ids ship
    back. Owner-side randomness is keyed by ``fold_in(key, axis_index)``
    (deterministic per mesh). ``method`` passes through to the owner-side
    sampler — "windowed" works unchanged because the local CSR's
    ``edge_dst`` slice carries GLOBAL neighbor ids. Returns ``(ids [q, k],
    mask [q, k], violated)``; with ``fanout >= max degree`` or
    ``fanout=None`` the result is deterministic and equals the
    single-device sampler's — for the EXACT methods only ("windowed"
    never returns more than one 128-lane window per parent, so covering
    fanouts do not make it deterministic)."""
    from graphsage_tpu.ops.sampling import sample_neighbors

    np_ = adj.rows_per_shard
    s = jax.lax.axis_size(axis)
    my_first = jax.lax.axis_index(axis) * np_
    recv_req, ctx = _route_requests(
        axis, ids.reshape(-1).astype(jnp.int32), np_, capacity, valid_mask
    )
    local_rows = jnp.clip(recv_req.reshape(-1) - my_first, 0, np_ - 1)
    skey = jax.random.fold_in(key, jax.lax.axis_index(axis))
    nids, nmask = sample_neighbors(
        skey, ell_local, deg_local, local_rows, fanout,
        method=method,
        indptr=indptr_local, edge_dst=edge_dst_local,
        ell_covers_all=adj.ell_covers_all,
    )
    k = nids.shape[-1]
    back_ids = _route_answers(axis, nids.reshape(s, capacity, k), ctx)
    back_mask = _route_answers(axis, nmask.reshape(s, capacity, k), ctx)
    if valid_mask is not None:
        back_mask = back_mask & valid_mask.reshape(-1)[:, None]
    return back_ids, back_mask, ctx.violated


def sharded_random_walk(
    axis: str,
    adj: ShardedAdjacency,
    ell_local: jax.Array,  # [Np, W]
    deg_local: jax.Array,  # [Np]
    indptr_local: jax.Array,  # [Np + 1]
    edge_dst_local: jax.Array,  # [E_max]
    starts: jax.Array,  # [b] this chip's walk starts (global ids)
    length: int,
    key: jax.Array,
    slack: float,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """DISTRIBUTED uniform random walks (call inside shard_map): each of
    the ``length`` steps is one :func:`sharded_sample_neighbors` round with
    ``fanout=1`` — current positions route to their owner shard, the owner
    draws one neighbor from its E/S adjacency slice, the step ships back.
    Same semantics as :func:`graphsage_tpu.ops.walks.random_walk` (sinks
    stay put, masked from there on; exactly equal on graphs where the step
    is deterministic, e.g. out-degree 1 — test-pinned). Returns
    ``(walks [b, length+1], valid [b, length+1], violated)``."""
    starts = starts.reshape(-1).astype(jnp.int32)
    s = jax.lax.axis_size(axis)
    cap = request_capacity(int(starts.shape[0]), s, slack)
    keys = jax.random.split(key, max(length, 1))
    cur = starts
    alive = jnp.ones(starts.shape, bool)
    steps = [starts]
    flags = [alive]
    violated = jnp.zeros((), bool)
    for t in range(length):
        nids, nmask, viol = sharded_sample_neighbors(
            axis, adj, ell_local, deg_local, indptr_local, edge_dst_local,
            cur, 1, keys[t], cap, valid_mask=alive,
        )
        violated = violated | viol
        step_ok = alive & nmask[..., 0]
        cur = jnp.where(step_ok, nids[..., 0], cur)
        alive = step_ok
        steps.append(cur)
        flags.append(alive)
    return jnp.stack(steps, axis=-1), jnp.stack(flags, axis=-1), violated


def sharded_sample_frontier(
    axis: str,
    model: GraphSAGE,
    adj: ShardedAdjacency,
    adj_leaves: tuple,  # (ell, deg, indptr, edge_dst[, cache...]) local [1, ...] leaves
    seeds_local: jax.Array,  # [B_local]
    key: jax.Array,
    slack: float,
) -> tuple[Frontier, jax.Array]:
    """Per-shard frontier expansion mirroring :meth:`GraphSAGE.sample`,
    with every hop's neighbor lookup distributed (call inside shard_map).
    Returns the shard-local Frontier and an overflow flag."""
    # layer0="cached" rides its table shards after the 4 adjacency leaves.
    ell, deg, indptr, edge_dst = (a[0] for a in adj_leaves[:4])
    s = jax.lax.axis_size(axis)
    seeds_local = seeds_local.reshape(-1)
    ids = [seeds_local]
    masks = [jnp.ones(seeds_local.shape, bool)]
    violated = jnp.zeros((), bool)
    L = model.num_layers
    # layer0="full"/"cached" skip the deepest hop (layer 0 reads a per-node
    # table instead) — mirrors GraphSAGE.sample exactly.
    hops = L - 1 if model.layer0 in ("full", "cached") else L
    hop_keys = jax.random.split(key, max(hops, 1))
    for h in range(1, hops + 1):
        fanout = model.fanouts[L - h]
        parent_ids, parent_mask = ids[-1], masks[-1]
        cap = request_capacity(int(parent_ids.shape[0]), s, slack)
        nids, nmask, viol = sharded_sample_neighbors(
            axis, adj, ell, deg, indptr, edge_dst,
            parent_ids, fanout, hop_keys[h - 1], cap,
            valid_mask=parent_mask, method=model.sampling,
        )
        violated = violated | viol
        if model.concat_self or model.self_loop:
            nids = jnp.concatenate([parent_ids[:, None], nids], axis=1)
            nmask = jnp.concatenate([parent_mask[:, None], nmask], axis=1)
        ids.append(nids.reshape(-1))
        masks.append(nmask.reshape(-1))
    return Frontier(ids=tuple(ids), masks=tuple(masks)), violated


class FullyShardedTrainer(ShardedFeatureTrainer):
    """Sampled training with NOTHING graph-sized replicated: adjacency,
    feature table, and seed batch all shard over one mesh axis. Each hop's
    neighbor expansion is a distributed sample (request-routing all_to_all
    to the owner, owner-side vectorized sampling, ids routed back); the
    feature lookup uses the compact sharded gather. Per-chip graph memory
    is ``E/S`` edges + ``N/S * F`` features.

    Sampling randomness is owner-keyed, so losses are not bit-equal to the
    single-device trainer in general — parity is pinned where sampling is
    deterministic (``fanout >= max degree`` / ``fanout=None``), plus
    shape/mask invariants (tests/test_feature_store.py).

    ``layer0="full"`` derives the layer-0 edge slice from the sharded
    adjacency itself (:func:`local_edges_from_adjacency`) — per-chip graph
    memory stays ``E/S`` edges, no second edge copy.
    """

    # Layer-0 edge slices come from the sharded adjacency's local CSR, not
    # a second host-side split (see ShardedFeatureTrainer.__init__).
    _layer0_edges_from_adjacency = True

    def __init__(self, model, graph, config, mesh, axis="data",
                 capacity_slack: float = 1.5,
                 layer0_exchange: str = "allgather",
                 feature_store: NodeShardedFeatures | None = None,
                 hub_cache_rows: int = 0):
        if model.sampling == "topk":
            raise ValueError(
                "FullyShardedTrainer samples through the owner-side CSR "
                "slice; method='topk' is ELL-only — use 'floyd' (exact) "
                "or 'windowed'"
            )
        super().__init__(
            model, graph, config, mesh, axis=axis,
            gather_mode="compact", capacity_slack=capacity_slack,
            layer0_exchange=layer0_exchange, feature_store=feature_store,
            hub_cache_rows=hub_cache_rows,
        )
        self.adjacency = shard_adjacency(
            graph, mesh.shape[axis], sharding=self._shard_sharding
        )
        # Feature and adjacency shards share one ownership rule; the layer-0
        # spmm closure indexes the all_gathered table by global node id,
        # which requires identical row padding.
        assert self.adjacency.rows_per_shard == self.features.rows_per_shard
        self.adjacency_shards = (
            self.adjacency.ell, self.adjacency.degrees,
            self.adjacency.indptr, self.adjacency.edge_dst,
        )
        if model.layer0 == "cached":
            # The frozen-aggregate table shards (built in the parent init,
            # riding edge_slice_leaves there) travel after the 4 adjacency
            # leaves here — one payload tuple per step, sliced apart inside
            # shard_map (sharded_sample_frontier reads [:4], the layer-0
            # table fn reads [4:]).
            self.adjacency_shards = self.adjacency_shards + self.edge_slice_leaves
        self._jit_eval_fs: dict = {}  # keyed by capacity slack (static)

    def _place_graph(self, graph):
        """Device payload: labels ONLY ([N] int32 — tiny). Feature table
        and adjacency both become placeholders; the sharded stores built in
        __init__ are the only graph-sized device residents (E/S edges +
        N/S*F features per chip)."""
        blanked = graph.replace(
            features=np.zeros((1, graph.num_features), dtype=graph.features.dtype),
            neighbors=np.zeros((1, 1), np.int32),
            degrees=np.zeros((1,), np.int32),
            indptr=np.zeros((2,), np.int32),
            edge_dst=np.zeros((1,), np.int32),
            edge_src=np.zeros((1,), np.int32),
            edge_mask=np.zeros((1,), bool),
            # The frozen-aggregate cache is graph-sized too — it lives ONLY
            # in the sharded store riding adjacency_shards, never here (a
            # replicated [N, F] device copy would defeat the whole N/S
            # residency contract).
            layer0_cache=None,
        )
        return blanked.to_device()

    def _layer0_table_fn_adj(self, adj_local):
        """``layer0="full"`` table closure from this shard's adjacency
        leaves ``(ell, deg, indptr, edge_dst)`` — the COO edge slice is
        derived in-trace from the local CSR (no duplicate edges on chip),
        then delegates to :meth:`_layer0_table_fn`. Call inside shard_map;
        returns None when layer0 is sampled. ``layer0="cached"`` reads its
        (params-independent) table slice from the leaves after the 4
        adjacency ones instead."""
        if self.model.layer0 == "cached":
            return self._cache_table_fn(adj_local[4:])
        if self.model.layer0 != "full":
            return None
        _ell, deg, indptr, edge_dst = adj_local[:4]
        e_src, e_dst, e_mask = local_edges_from_adjacency(
            indptr, edge_dst, self.adjacency.rows_per_shard
        )
        return self._layer0_table_fn_slices((e_src, e_dst, e_mask, deg))

    def _fully_sharded_step(self, state, feature_shards, hub, adj_leaves,
                            seeds, slack=None):
        model = self.model
        axis = self.axis
        adj = self.adjacency
        slack = self.capacity_slack if slack is None else slack
        next_key, sample_key = jax.random.split(state.key)
        gather_fn, gather_mean_fn = make_sharded_gather_fns(
            axis, mode="compact",
            num_shards=self.mesh.shape[axis], slack=slack,
        )
        labels_all = self.graph.labels  # [N] int32 — tiny, replicated

        def shard_step(params, shard, hub_l, adj_local, seeds_local,
                       labels_local):
            shard_l = _lead0(shard)
            g_fn, gm_fn = _hub_wrap_gather_fns(gather_fn, gather_mean_fn,
                                               hub_l)
            frontier, violated = sharded_sample_frontier(
                axis, model, adj, adj_local, seeds_local[0], sample_key,
                slack,
            )
            # Feature-gather sites overflow independently of sampling hops.
            violated = violated | self._local_sites_violated(
                frontier, slack=slack,
                hub_lookup=hub_l[0] if hub_l else None,
            )
            table_fn = self._layer0_table_fn_adj(
                tuple(a[0] for a in adj_local)
            )

            def loss_fn(p):
                return model.loss(
                    p, shard_l, frontier, labels_local,
                    gather_fn=g_fn, gather_mean_fn=gm_fn,
                    layer0_table=(
                        table_fn(p, shard_l) if table_fn is not None else None
                    ),
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            s = jax.lax.axis_size(axis)
            loss = jax.lax.psum(loss, axis) / s
            grads = jax.tree_util.tree_map(
                lambda t: jax.lax.psum(t, axis) / s, grads
            )
            violated = jax.lax.psum(violated.astype(jnp.int32), axis) > 0
            return loss, grads, violated

        labels = jnp.take(labels_all, seeds, axis=0)
        loss, grads, violated = shard_map(
            shard_step,
            mesh=self.mesh,
            in_specs=(
                P(), P(self.axis), P(),
                (P(self.axis),) * len(adj_leaves),
                P(self.axis), P(self.axis),
            ),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )(state.params, feature_shards, hub, adj_leaves,
          seeds.reshape(self.mesh.shape[self.axis], -1), labels)

        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               key=next_key, step=state.step + 1)
        return _guard_state_update(violated, state, new_state), loss, violated

    def _step_impl(self, state, *args, slack=None):
        return self._fully_sharded_step(state, *args, slack=slack)

    def _step_call_args(self, seeds):
        return (self.feature_shards, self.hub_leaves, self.adjacency_shards,
                seeds)

    def _block_payload(self):
        return (self.feature_shards, self.hub_leaves, self.adjacency_shards)

    def _train_block(self, state, payload, seeds_all):
        feature_shards, hub, adjacency_shards = payload

        def body(st, seeds):
            st, loss, violated = self._fully_sharded_step(
                st, feature_shards, hub, adjacency_shards, seeds
            )
            return st, (loss, violated)

        state, (losses, violated) = jax.lax.scan(body, state, seeds_all)
        return state, losses, violated

    # step() is inherited: the ShardedFeatureTrainer retry ladder drives
    # _step_impl/_step_call_args above, covering sampling-hop and
    # feature-gather overflows alike (both fold into the violated flag).

    # ------------------------------------------------------------------ eval
    def _eval_logits_fully_sharded(
        self, params, feature_shards, hub, adj_leaves, seeds, slack,
        return_embeddings: bool = False,
    ):
        """Sampled eval logits with DISTRIBUTED per-hop sampling — the eval
        counterpart of ``_fully_sharded_step``. Nothing graph-sized touches
        a replicated buffer: each hop routes frontier ids to their owner
        shard (E/S adjacency), features ride the compact sharded gather
        (N/S*F). Fixed key — deterministic given the seed set. The
        replicated-sampling ``_eval_logits_sharded`` is unreachable here
        (the resident graph's adjacency is a placeholder)."""
        import dataclasses as _dc

        axis = self.axis
        adj = self.adjacency
        fanouts = self.cfg.eval_fanouts or self.model.fanouts
        model = _dc.replace(self.model, fanouts=tuple(fanouts))
        key = jax.random.PRNGKey(self.cfg.seed + 7)
        gather_fn, gather_mean_fn = make_sharded_gather_fns(
            axis, mode="compact",
            num_shards=self.mesh.shape[axis], slack=slack,
        )

        def shard_fwd(params, shard, hub_l, adj_local, seeds_local):
            shard_l = _lead0(shard)
            g_fn, gm_fn = _hub_wrap_gather_fns(gather_fn, gather_mean_fn,
                                               hub_l)
            frontier, violated = sharded_sample_frontier(
                axis, model, adj, adj_local, seeds_local[0], key, slack
            )
            violated = violated | self._local_sites_violated(
                frontier, model, slack=slack,
                hub_lookup=hub_l[0] if hub_l else None,
            )
            table_fn = self._layer0_table_fn_adj(
                tuple(a[0] for a in adj_local)
            )
            logits = model.forward(
                params, shard_l, frontier,
                gather_fn=g_fn, gather_mean_fn=gm_fn,
                return_embeddings=return_embeddings,
                layer0_table=(
                    table_fn(params, shard_l)
                    if table_fn is not None
                    else None
                ),
            )
            violated = jax.lax.psum(violated.astype(jnp.int32), axis) > 0
            return logits, violated

        return shard_map(
            shard_fwd,
            mesh=self.mesh,
            in_specs=(
                P(), P(self.axis), P(),
                (P(self.axis),) * len(adj_leaves),
                P(self.axis),
            ),
            out_specs=(P(self.axis), P()),
            check_vma=False,
        )(params, feature_shards, hub, adj_leaves,
          seeds.reshape(self.mesh.shape[self.axis], -1))

    def _eval_with_slack_retries(self, params, seeds, *,
                                 return_embeddings: bool = False):
        """Distributed eval over padded ``seeds`` with the capacity-overflow
        policy: retry with doubled slack (a recompile, not a silent clip),
        up to 8x. Shared by the supervised and unsupervised fully-sharded
        predicts; jitted variants cache per (slack, return_embeddings)."""
        import warnings

        seeds_dev = jax.device_put(jnp.asarray(seeds, jnp.int32), self._repl)
        slacks = [
            float(self.capacity_slack) * (2.0 ** i)
            for i in range(self._SLACK_RETRIES)
        ]
        for i, slack in enumerate(slacks):
            cache_key = (slack, return_embeddings)
            fn = self._jit_eval_fs.get(cache_key)
            if fn is None:
                fn = jax.jit(functools.partial(
                    self._eval_logits_fully_sharded, slack=slack,
                    return_embeddings=return_embeddings,
                ))
                self._jit_eval_fs[cache_key] = fn
            out, violated = fn(
                params, self.feature_shards, self.hub_leaves,
                self.adjacency_shards, seeds_dev,
            )
            if not bool(violated):
                return out
            if i + 1 < len(slacks):
                warnings.warn(
                    "distributed eval request capacity exceeded at "
                    f"slack={slack}; retrying with slack={slacks[i + 1]} "
                    "(set capacity_slack higher to avoid the recompile)"
                )
        raise ValueError(
            "distributed eval request capacity still exceeded after "
            f"retries up to slack={slacks[-1]} — the seed set's requests "
            "are extraordinarily skewed; raise capacity_slack explicitly"
        )

    def predict(self, state, nodes):
        """Distributed sampled eval (fanouts = ``eval_fanouts`` or the
        model's): adjacency stays E/S and features N/S*F per chip through
        eval too — there is deliberately no replicated fallback here. A
        capacity overflow retries with doubled slack (a recompile, not a
        silent clip); covering fanouts reproduce the replicated trainer's
        deterministic eval exactly (test-pinned; floyd sampling only —
        windowed never covers beyond one 128-lane window per parent)."""
        nodes = np.asarray(nodes)
        s = self.mesh.shape[self.axis]
        pad = (-len(nodes)) % s
        seeds = np.concatenate([nodes, np.zeros(pad, nodes.dtype)])
        logits = self._eval_with_slack_retries(state.params, seeds)
        if not logits.sharding.is_fully_addressable:
            # Multi-process mesh: the sharded logits span processes; gather
            # every process's addressable rows so the host-side argmax sees
            # the full batch (each process returns identical predictions).
            from jax.experimental import multihost_utils as mhu

            logits = mhu.process_allgather(logits, tiled=True)
        return self.model.predictions(logits)[: len(nodes)]

    def memory_stats(self) -> dict:
        return {**super().memory_stats(), **self.adjacency.memory_stats()}
