"""Degree-bucketed full-graph mean aggregation (pure XLA).

The measured fastest full-graph SpMM formulation on v5e at post-projection
widths (docs/ROOFLINE.md): XLA's COO gather+segment-sum runs at the
~10-cycles-per-edge scatter floor (0.94 ms at Pubmed/F=128), while the
gather *unit* sustains ~200 GB/s on plain row gathers. So: sort nodes by
degree (host-side, once per graph), bucket them into power-of-two ELL
widths, and aggregate each bucket with ``k_b`` unrolled row gathers — total
traffic ≈ 2·E·F bytes of pure gathers, no scatter in the forward at all.

Backward uses the symmetric-adjacency identity (undirected graphs,
``Graph.symmetric``): ``dX = A^T D^-1 g`` = the same bucketed pass in
"sum of g/deg" form — also scatter-free. Asymmetric adjacency falls back
to XLA segment-sum.

Buckets are built from CSR (never the capped ELL view), so hub rows keep
their full neighbor lists. ELL bucket widths are capped at ``hub_cap``
(default 256): an uncapped last bucket would be the graph's true max degree,
and since ``_bucketed_pass`` statically unrolls one gather per slot, a
power-law hub (max degree >10K) would emit >10K HLO gathers per pass —
doubled by the custom backward, per layer, inside ``lax.scan`` — a
trace/compile blowup plus huge padded-gather waste. Rows with degree above
the cap instead aggregate through one exact COO gather + segment-sum over
just their CSR edges (the scatter floor, but only on the rare hub edges).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from graphsage_tpu.data.graph import Graph


class BucketedPlan(NamedTuple):
    """Static per-graph aggregation plan (host-precomputed).

    Nodes are ordered ascending by degree and split into buckets whose ELL
    width covers every member's full neighbor list."""

    inv_perm: jax.Array  # [N] position of node v's row in the bucket-concat order
    ell: tuple  # per bucket: int32 [N_b, w_b] neighbor ids (0-padded)
    deg: tuple  # per bucket: float32 [N_b] true degrees
    widths: tuple  # static per-bucket ELL widths
    # Hub overflow (rows with degree > hub_cap), appended after the ELL
    # buckets in the concat order; aggregated by COO segment-sum. All None
    # when no row exceeds the cap.
    hub_edge_src: jax.Array | None = None  # [E_hub] global src-node ids
    hub_edge_row: jax.Array | None = None  # [E_hub] local hub-row index
    hub_deg: jax.Array | None = None  # [N_hub] float32 true degrees


def plan_bucketed_spmm(
    graph: Graph, widths: Sequence[int] = (8, 32, 128), hub_cap: int = 256
) -> BucketedPlan:
    """Build the degree-bucket plan from the graph's (full) CSR.

    ``hub_cap`` bounds the widest ELL bucket (and thereby the static gather
    unroll); rows above it go to the COO hub group."""
    indptr = np.asarray(graph.indptr)
    edge_dst = np.asarray(graph.edge_dst)
    degrees = (indptr[1:] - indptr[:-1]).astype(np.int64)
    n = graph.num_nodes
    max_deg = int(degrees.max()) if n else 1

    cap_eff = min(max_deg, int(hub_cap))
    bounds = [w for w in sorted(widths) if w < cap_eff] + [max(cap_eff, 1)]
    order = np.argsort(degrees, kind="stable")
    inv_perm = np.empty(n, np.int32)

    ells, degs, used_widths = [], [], []
    lo = 0
    pos = 0
    for w in bounds:
        hi = int(np.searchsorted(degrees[order], w, side="right"))
        members = order[lo:hi]
        lo = hi
        if len(members) == 0:
            continue
        # Vectorized ELL fill (no per-row Python — a 1M-node plan must not
        # slice a million row segments): flat CSR positions of every member
        # edge, plus its within-row rank.
        deg_m = degrees[members]
        total = int(deg_m.sum())
        row_idx = np.repeat(np.arange(len(members)), deg_m)
        row_start = np.concatenate([[0], np.cumsum(deg_m)[:-1]])
        within = np.arange(total) - np.repeat(row_start, deg_m)
        src_pos = np.repeat(indptr[members], deg_m) + within
        ell = np.zeros((len(members), w), np.int32)
        ell[row_idx, within] = edge_dst[src_pos]
        inv_perm[members] = pos + np.arange(len(members))
        pos += len(members)
        ells.append(jnp.asarray(ell))
        degs.append(jnp.asarray(degrees[members].astype(np.float32)))
        used_widths.append(w)

    # Hub rows (degree > cap): exact COO edges, one segment-sum — no padding,
    # no unroll growth with max degree.
    hub_edge_src = hub_edge_row = hub_deg = None
    hubs = order[lo:]
    if len(hubs):
        deg_h = degrees[hubs]
        hub_edge_row = np.repeat(np.arange(len(hubs), dtype=np.int32), deg_h)
        within = (
            np.arange(int(deg_h.sum())) -
            np.repeat(np.concatenate([[0], np.cumsum(deg_h)[:-1]]), deg_h)
        )
        hub_edge_src = edge_dst[np.repeat(indptr[hubs], deg_h) + within]
        inv_perm[hubs] = pos + np.arange(len(hubs))
        hub_edge_src = jnp.asarray(hub_edge_src.astype(np.int32))
        hub_edge_row = jnp.asarray(hub_edge_row)
        hub_deg = jnp.asarray(deg_h.astype(np.float32))

    return BucketedPlan(
        inv_perm=jnp.asarray(inv_perm),
        ell=tuple(ells),
        deg=tuple(degs),
        widths=tuple(used_widths),
        hub_edge_src=hub_edge_src,
        hub_edge_row=hub_edge_row,
        hub_deg=hub_deg,
    )


def _bucketed_pass(x: jax.Array, plan: BucketedPlan, normalize: bool) -> jax.Array:
    """``out[v] = (1/deg(v))? * sum_{u in N(v)} x[u]`` via per-bucket
    unrolled row gathers; returns rows in the plan's node order."""
    parts = []
    for ell, deg, w in zip(plan.ell, plan.deg, plan.widths):
        iota_mask = (
            jax.lax.broadcasted_iota(jnp.int32, ell.shape, 1)
            < deg.astype(jnp.int32)[:, None]
        )
        wgt = iota_mask.astype(x.dtype)
        acc = jnp.zeros((ell.shape[0], x.shape[-1]), x.dtype)
        for j in range(w):  # static unroll: w row gathers, no [N_b, w, F]
            acc = acc + jnp.take(x, ell[:, j], axis=0) * wgt[:, j : j + 1]
        if normalize:
            acc = acc / jnp.maximum(deg, 1.0)[:, None].astype(x.dtype)
        parts.append(acc)
    if plan.hub_deg is not None:
        # Hub rows sum up to max-degree addends: accumulate f32 so a bf16
        # same-sign sum cannot saturate (ELL buckets are capped at <=256
        # addends and stay in the compute dtype).
        hub = jax.ops.segment_sum(
            jnp.take(x, plan.hub_edge_src, axis=0).astype(jnp.float32),
            plan.hub_edge_row,
            num_segments=plan.hub_deg.shape[0],
        )
        if normalize:
            hub = hub / plan.hub_deg[:, None]
        parts.append(hub.astype(x.dtype))
    stacked = jnp.concatenate(parts, axis=0)
    return jnp.take(stacked, plan.inv_perm, axis=0)


def make_spmm_mean_bucketed(plan: BucketedPlan):
    """Return ``f(x) -> D^-1 A x`` with a scatter-free custom backward.

    The plan (a fixed per-graph constant) is closed over, so bucket widths
    stay static under jit. Only valid for symmetric adjacency (the backward
    uses ``A == A^T``); callers must check ``Graph.symmetric``.
    """
    deg_parts = list(plan.deg)
    if plan.hub_deg is not None:
        deg_parts.append(plan.hub_deg)
    deg_full = jnp.take(jnp.concatenate(deg_parts), plan.inv_perm, axis=0)

    @jax.custom_vjp
    def spmm_mean(x: jax.Array) -> jax.Array:
        return _bucketed_pass(x, plan, normalize=True)

    def _fwd(x):
        return _bucketed_pass(x, plan, normalize=True), None

    def _bwd(_, g):
        # dX[u] = sum_{v: u in N(v)} g[v]/deg(v) = sum_{v in N(u)} g[v]/deg(v).
        gs = g / jnp.maximum(deg_full, 1.0)[:, None].astype(g.dtype)
        return (_bucketed_pass(gs, plan, normalize=False),)

    spmm_mean.defvjp(_fwd, _bwd)
    return spmm_mean
