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
their full neighbor lists; the last bucket's width is the true max degree
(hubs are rare, so its padded table stays small).
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


def plan_bucketed_spmm(
    graph: Graph, widths: Sequence[int] = (8, 32, 128)
) -> BucketedPlan:
    """Build the degree-bucket plan from the graph's (full) CSR."""
    indptr = np.asarray(graph.indptr)
    edge_dst = np.asarray(graph.edge_dst)
    degrees = (indptr[1:] - indptr[:-1]).astype(np.int64)
    n = graph.num_nodes
    max_deg = int(degrees.max()) if n else 1

    bounds = [w for w in sorted(widths) if w < max_deg] + [max(max_deg, 1)]
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

    return BucketedPlan(
        inv_perm=jnp.asarray(inv_perm),
        ell=tuple(ells),
        deg=tuple(degs),
        widths=tuple(used_widths),
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
    stacked = jnp.concatenate(parts, axis=0)
    return jnp.take(stacked, plan.inv_perm, axis=0)


def make_spmm_mean_bucketed(plan: BucketedPlan):
    """Return ``f(x) -> D^-1 A x`` with a scatter-free custom backward.

    The plan (a fixed per-graph constant) is closed over, so bucket widths
    stay static under jit. Only valid for symmetric adjacency (the backward
    uses ``A == A^T``); callers must check ``Graph.symmetric``.
    """
    deg_full = jnp.take(jnp.concatenate(list(plan.deg)), plan.inv_perm, axis=0)

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
