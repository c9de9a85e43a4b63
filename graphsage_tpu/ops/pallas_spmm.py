"""Pallas TPU kernel: full-graph CSR x dense SpMM (row-normalized mean).

``spmm_mean_vmem(features[N, F], indptr[N+1], edge_dst[E_pad]) -> [N, F]``

The full-graph analog of the reference's dense ``mask.mm(embed_matrix)``
aggregation (reference graphsage/aggregators.py:58-64) run over every node
with complete neighborhoods. The whole (projected) feature table is pinned
in VMEM once; a row-blocked sequential grid then walks each row's CSR edge
range and accumulates neighbor rows with dynamic-index VMEM reads — no HBM
traffic per edge at all (the table is ~10 MB at Pubmed scale post
projection; HBM moves only N*F in + N*F out).

Measured reality on TPU v5e (power-law graphs, F=128, scan-amortized with
relay overhead subtracted — see docs/ROOFLINE.md for the full table):

=====================  ========  =========  ==========
shape                  this      XLA (take  per-edge
                       kernel    + segment  cost
                                 -sum)
=====================  ========  =========  ==========
Cora   N=2708 E=11K    0.17 ms   0.15 ms    ~12 cycles
Pubmed N=19717 E=89K   1.05 ms   0.94 ms    ~10 cycles
=====================  ========  =========  ==========

Both implementations sit at the same **per-edge scalar floor** (~10 cycles
per edge): XLA's scatter-add and this kernel's dynamic VMEM row
read-accumulate each issue one dynamically-addressed [1, F] vector op per
edge, and at mean-aggregation's arithmetic intensity (avg degree ~4.5,
F=128 post projection) that scalar issue rate — not HBM bandwidth — is the
binding resource. A 4-wide manual unroll of the edge loop does not move it
(1.10 ms: the bound is the dynamic-address operand fetch, not loop
overhead). The BASELINE north-star "SpMM >= 70% of HBM roofline" is
therefore not a meaningful target for this op on this hardware: during the
~1 ms Pubmed aggregation only ~20 MB of HBM moves (2% utilization), and the
same holds for every alternative formulation measured (dense one-hot MXU:
O(N^2 F) = 2.2 ms; per-edge HBM DMA: DMA-issue-bound; degree-bucketed
unrolled gathers: gather-unit-bound at ~200 GB/s). The framework's answer
to the roofline goal is algorithmic: the project-then-aggregate reordering
(models/graphsage.py) shrinks every aggregated row from F_in to d_out so
the whole op runs 4-11x less work — and the dispatcher keeps XLA's
segment-sum (the measured winner by ~10%) as the default full-graph path.

This kernel remains the right tool when the [E, F] per-edge intermediate
that XLA materializes (45 MB at Pubmed, 1 GB at the 1M-node synthetic)
must not exist — it streams nothing but the table — and as the base for
the halo-exchange variant where the table is a shard plus received
boundary rows.

Requires the f32 table to fit in VMEM (N_pad * F_pad * 4 <= ~12 MB);
``fits_vmem`` reports this. Backward uses the symmetric-adjacency identity
``dX = A^T D^-1 g`` — for the undirected graphs all loaders build
(A == A^T) it is one more call of the same kernel in "sum of g/deg" form;
callers with directed adjacency get the XLA segment fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
DEFAULT_ROW_BLOCK = 8
VMEM_TABLE_BUDGET = 12 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fits_vmem(num_nodes: int, num_features: int) -> bool:
    """Whether the f32 feature table fits the kernel's VMEM budget."""
    return (
        _round_up(num_nodes, DEFAULT_ROW_BLOCK)
        * _round_up(num_features, LANE)
        * 4
        <= VMEM_TABLE_BUDGET
    )


def _kernel(indptr_ref, dst_ref, feat_ref, out_ref, *, rb, f_pad, normalize):
    """One grid step: ``rb`` output rows; each walks its CSR edge range and
    accumulates neighbor rows from the VMEM-resident table."""
    r0 = pl.program_id(0) * rb
    for rr in range(rb):
        start = indptr_ref[r0 + rr]
        end = indptr_ref[r0 + rr + 1]

        def body(e, acc):
            d = dst_ref[e]
            return acc + feat_ref[pl.ds(d, 1), :]

        row = jax.lax.fori_loop(start, end, body, jnp.zeros((1, f_pad), jnp.float32))
        if normalize:
            cnt = jnp.maximum((end - start).astype(jnp.float32), 1.0)
            row = row / cnt
        out_ref[pl.ds(rr, 1), :] = row


def _spmm_impl(
    features: jax.Array,
    indptr: jax.Array,
    edge_dst: jax.Array,
    *,
    normalize: bool,
    row_block: int = DEFAULT_ROW_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    n, f = features.shape
    f_pad = _round_up(f, LANE)
    n_pad = _round_up(n, row_block)
    feats = features.astype(jnp.float32)
    if f_pad != f:
        feats = jnp.pad(feats, ((0, 0), (0, f_pad - f)))
    # Rows beyond N get an empty edge range (repeated final offset).
    ip = jnp.pad(indptr.astype(jnp.int32), (0, n_pad - n), mode="edge")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_pad // row_block,),
        in_specs=[
            pl.BlockSpec((n, f_pad), lambda i, *_: (0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (row_block, f_pad), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, rb=row_block, f_pad=f_pad, normalize=normalize),
        out_shape=jax.ShapeDtypeStruct((n_pad, f_pad), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * int(edge_dst.shape[0]) * f_pad,
            bytes_accessed=2 * n_pad * f_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(ip, edge_dst.astype(jnp.int32), feats)
    return out[:n, :f]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def spmm_mean_vmem(
    features: jax.Array,
    indptr: jax.Array,
    edge_dst: jax.Array,
    symmetric: bool = True,
    row_block: int = DEFAULT_ROW_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    """``out[v] = mean_{u in N(v)} features[u]`` over the full CSR graph.

    ``symmetric=True`` (every loader-built graph: adjacency is undirected,
    graph.py:85) enables the fused Pallas backward; pass ``False`` for
    directed adjacency to get the XLA segment-sum transpose instead.
    """
    return _spmm_impl(
        features, indptr, edge_dst,
        normalize=True, row_block=row_block, interpret=interpret,
    )


def _fwd(features, indptr, edge_dst, symmetric, row_block, interpret):
    out = _spmm_impl(
        features, indptr, edge_dst,
        normalize=True, row_block=row_block, interpret=interpret,
    )
    sentinel = jnp.zeros((features.shape[0], 0), features.dtype)
    return out, (sentinel, indptr, edge_dst)


def _bwd(symmetric, row_block, interpret, res, g):
    sentinel, indptr, edge_dst = res
    n, dtype = sentinel.shape[0], sentinel.dtype
    deg = jnp.maximum((indptr[1:] - indptr[:-1]).astype(jnp.float32), 1.0)
    gs = g.astype(jnp.float32) / deg[:, None]
    if symmetric:
        # dX[u] = sum_{v: u in N(v)} g[v]/deg(v) = sum_{v in N(u)} g[v]/deg(v).
        dfeat = _spmm_impl(
            gs, indptr, edge_dst,
            normalize=False, row_block=row_block, interpret=interpret,
        )
    else:
        e = edge_dst.shape[0]
        src = jnp.searchsorted(
            indptr[1:], jnp.arange(e, dtype=indptr.dtype), side="right"
        ).astype(jnp.int32)
        valid = jnp.arange(e) < indptr[-1]
        per_edge = jnp.where(valid[:, None], jnp.take(gs, src, axis=0), 0.0)
        dfeat = jax.ops.segment_sum(per_edge, edge_dst, num_segments=n)
    return dfeat.astype(dtype), None, None


spmm_mean_vmem.defvjp(_fwd, _bwd)
