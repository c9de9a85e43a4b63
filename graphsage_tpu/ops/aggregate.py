"""Aggregation primitives: masked mean / max and full-graph segment ops.

The reference aggregates by materializing a dense row-normalized 0/1 mask and
multiplying it with a gathered feature matrix (reference
graphsage/aggregators.py:50-64). Here aggregation is expressed directly as
masked reductions over static-shape gathered neighborhoods (minibatch path)
or as edge-segment sums over CSR/COO (full-graph path) — both forms XLA maps
straight onto TPU gathers + VPU reductions. Two Pallas kernels back the hot
gather-mean: the one-hot MXU matmul (:mod:`graphsage_tpu.ops.pallas_onehot`,
the small-table winner, in the ``"auto"`` dispatch) and the streaming-DMA
kernel (:mod:`graphsage_tpu.ops.pallas_gather`, selectable as
``impl="dma"`` — measured slower than the unrolled XLA gather on v5e due to
8-row DMA alignment, so never auto-selected; see docs/ROOFLINE.md).

Denominator semantics follow the reference (quirk Q8): the mean divides by the
number of *valid* sampled neighbors, ``min(degree, fanout)``, never by the
fanout. Zero-valid rows divide by 1 and yield zeros (guarded mean — quirk Q4
divergence, documented in sampling.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def gather(features: jax.Array, ids: jax.Array) -> jax.Array:
    """Feature-store lookup: ``features[N, F]`` indexed by ``ids[...]``.

    The TPU-native stand-in for the reference's frozen ``nn.Embedding``
    (reference graphsage/model.py:70-71): one device gather, differentiable,
    shardable along either axis.
    """
    return jnp.take(features, ids, axis=0)


def masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean of ``x[..., k, F]`` over axis -2, counting only ``mask[..., k]``.

    Guarded: rows with zero valid entries return 0 rather than NaN.
    """
    m = mask.astype(x.dtype)[..., None]
    total = jnp.sum(x * m, axis=-2)
    count = jnp.sum(m, axis=-2)
    return total / jnp.maximum(count, 1.0)


def masked_max(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Max of ``x[..., k, F]`` over axis -2 under ``mask``; 0 where all-masked.

    The reduction behind the max-pooling aggregator (GraphSAGE-pool).
    """
    neg = jnp.finfo(x.dtype).min
    masked = jnp.where(mask[..., None], x, neg)
    out = jnp.max(masked, axis=-2)
    any_valid = jnp.any(mask, axis=-1, keepdims=True)
    return jnp.where(any_valid, out, jnp.zeros_like(out))


def segment_mean_csr(
    values: jax.Array,
    edge_src: jax.Array,
    edge_mask: jax.Array,
    num_nodes: int,
) -> jax.Array:
    """Per-destination mean of per-edge ``values[E_pad, F]`` grouped by
    ``edge_src`` (COO rows). Padding edges (``edge_mask=False``) contribute 0.
    """
    # BOTH accumulators run in f32 regardless of compute dtype: a bf16
    # scatter-add saturates once the running sum exceeds ~256x the addend
    # scale (256+1 rounds back to 256) — counts would wreck hub-row
    # divisors, and same-sign hub numerators (ReLU activations) would
    # stall the same way. Inputs/outputs stay in the compute dtype; only
    # the reduction is widened.
    w32 = edge_mask.astype(jnp.float32)
    summed = jax.ops.segment_sum(
        values.astype(jnp.float32) * w32[:, None], edge_src,
        num_segments=num_nodes,
    )
    counts = jax.ops.segment_sum(w32, edge_src, num_segments=num_nodes)
    mean = summed / jnp.maximum(counts, 1.0)[:, None]
    return mean.astype(values.dtype)


def _gather_mean_fwd_dispatch(
    features: jax.Array,
    idx: jax.Array,
    mask: jax.Array,
    impl: str,
    bf16: bool,
) -> jax.Array:
    if impl == "auto":
        # Constants measured on TPU v5e (scan-amortized):
        #   one-hot MXU matmul     ~45 TFLOP/s -> 2*B*N*F flops
        #   unrolled fused gather  ~200 GB/s   -> B*k*F*4 bytes
        # Verified crossovers: Cora (N=2708,k=10) onehot 0.42ms vs 1.48ms;
        # Pubmed (N=19717) unrolled 2.5ms vs onehot 9.3ms.
        on_tpu = jax.default_backend() not in ("cpu",)
        if not on_tpu:
            impl = "take"
        else:
            n, f = features.shape
            k = idx.shape[-1]
            b = idx.size // k
            onehot_sec = 2.0 * b * n * f / 45e12
            gather_sec = (b * k * f * 4 + b * f * 4) / 200e9
            small_fanout = k <= 32  # unrolled compare loop in-kernel
            impl = (
                "onehot_pallas"
                if (small_fanout and onehot_sec < gather_sec)
                else "unrolled"
            )
    if impl == "onehot_pallas":
        from graphsage_tpu.ops.pallas_onehot import _onehot_gather_mean_impl

        return _onehot_gather_mean_impl(features, idx, mask, bf16=bf16)
    if impl == "unrolled":
        w = mask.astype(features.dtype)
        acc = jnp.zeros((*idx.shape[:-1], features.shape[1]), features.dtype)
        for j in range(idx.shape[-1]):
            acc = acc + jnp.take(features, idx[..., j], axis=0) * w[..., j : j + 1]
        return acc / jnp.maximum(w.sum(axis=-1, keepdims=True), 1.0)
    if impl == "take":
        return masked_mean(jnp.take(features, idx, axis=0), mask)
    if impl == "dma":
        from graphsage_tpu.ops.pallas_gather import _gather_mean_impl

        lead = idx.shape[:-1]
        out = _gather_mean_impl(
            features,
            idx.reshape(-1, idx.shape[-1]),
            mask.reshape(-1, mask.shape[-1]),
            interpret=jax.default_backend() in ("cpu",),
        )
        return out.reshape(*lead, features.shape[-1])
    raise ValueError(f"unknown gather_mean impl {impl!r}")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gather_mean(
    features: jax.Array,
    idx: jax.Array,
    mask: jax.Array,
    impl: str = "auto",
    bf16: bool = False,
) -> jax.Array:
    """Fused ``masked_mean(features[idx], mask)`` -> ``[B, F]`` dispatcher.

    Forward implementations (measured on TPU v5e, scan-amortized):

    * ``"onehot_pallas"`` — MXU one-hot matmul Pallas kernel. O(B*N*F)
      compute, streams the whole table: wins when the node table is small
      relative to the fanout (Cora: 0.42 ms vs 1.48 ms XLA gather).
    * ``"unrolled"`` — k separate gathers fused into an accumulator, never
      materializing ``[B, k, F]`` in HBM. O(B*k*F) traffic at ~200 GB/s:
      2.1x faster than take at Pubmed shapes (2.5 ms vs 5.3 ms).
    * ``"take"`` — XLA gather of ``[B, k, F]`` + masked mean. The simple
      oracle path (exact same math as unrolled; both exact f32).
    * ``"dma"`` — streaming double-buffered DMA Pallas kernel
      (:mod:`graphsage_tpu.ops.pallas_gather`). Roofline-minimal traffic in
      theory, but 8-row DMA alignment costs 8x read amplification on random
      rows (measured slower than unrolled on v5e) — opt-in, never "auto".
    * ``"auto"`` — cost-model routing between onehot_pallas and unrolled on
      TPU; take on CPU (Pallas would run interpreted).

    The backward (feature cotangent ``dX = Mᵀ @ (g/cnt)``) is dispatched
    independently of the forward: the Pallas transposed one-hot MXU kernel
    when its dense O(N*B*F) work beats XLA's scatter (Cora step shapes:
    0.1 ms vs 0.72 ms), XLA segment-sum otherwise (Pubmed's 256K-row
    scatter: 2.7 ms vs 3.7 ms dense). Measured v5e fit: scatter ≈
    0.5 ms + 8.6 ns/row; one-hot ≈ 2*N*B*F / 45 TFLOP/s.
    """
    return _gather_mean_fwd_dispatch(features, idx, mask, impl, bf16)


def _gather_mean_fwd(features, idx, mask, impl, bf16):
    out = _gather_mean_fwd_dispatch(features, idx, mask, impl, bf16)
    sentinel = jnp.zeros((features.shape[0], 0), features.dtype)
    return out, (sentinel, idx, mask)


def _gather_mean_bwd(impl, bf16, res, g):
    sentinel, idx, mask = res
    n, dtype = sentinel.shape[0], sentinel.dtype
    f = g.shape[-1]
    idx2 = idx.reshape(-1, idx.shape[-1])
    mask2 = mask.reshape(-1, mask.shape[-1])
    g2 = g.reshape(-1, f)
    b, k = idx2.shape

    # Constants calibrated on v5e: the dense one-hot runs at ~30 TFLOP/s
    # effective (3.7 ms measured at N=19717 B=25600 F=128); XLA's scatter at
    # ~0.5 ms + 8.6 ns/row (0.72 ms @ 28K rows, 2.7 ms @ 256K rows).
    on_tpu = jax.default_backend() not in ("cpu",)
    onehot_sec = 2.0 * n * b * f / 30e12 + 2e-4
    scatter_sec = 5e-4 + 8.6e-9 * b * k
    if on_tpu and onehot_sec < scatter_sec:
        from graphsage_tpu.ops.pallas_onehot import _onehot_scatter_mean_grad

        # bf16 measured SLOWER for the one-hot (4.3 vs 3.7 ms at Pubmed
        # shapes — the compare/accumulate tile work dominates, not the MXU),
        # so the dense path always runs f32 regardless of the forward dtype.
        dfeat = _onehot_scatter_mean_grad(g2, idx2, mask2, n, bf16=False)
    elif bf16 and on_tpu:
        # Measured winner when the forward ran bf16 (benchmarks/
        # scatter_floor.py, Pubmed 256K-row shapes): bf16 per-edge rows
        # (half the materialize/read traffic) with f32 scatter accumulation
        # — 2.05 ms vs 2.34 for the f32 k-scatter loop (8.0 ns/row).
        w = mask2.astype(jnp.bfloat16)
        cnt = jnp.maximum(w.astype(jnp.float32).sum(axis=1, keepdims=True), 1.0)
        gs = (g2 / cnt).astype(jnp.bfloat16)
        per_edge = (
            jnp.repeat(gs, k, axis=0) * w.reshape(-1)[:, None]
        ).astype(jnp.float32)
        dfeat = jax.ops.segment_sum(
            per_edge, idx2.reshape(-1), num_segments=n
        )
    else:
        # k separate scatter-adds of [B, F] rows — never materializes the
        # [B*k, F] per-edge tensor (measured 2.34 ms vs 2.69 at Pubmed's
        # 256K-row backward; sorted-keys segment-sum 2.83 and dense one-hot
        # 3.62 are measured dead ends — benchmarks/scatter_floor.py).
        w = mask2.astype(g2.dtype)
        cnt = jnp.maximum(w.sum(axis=1, keepdims=True), 1.0)
        gs = g2 / cnt
        dfeat = jnp.zeros((n, f), gs.dtype)
        for j in range(k):
            dfeat = dfeat + jax.ops.segment_sum(
                gs * w[:, j : j + 1], idx2[:, j], num_segments=n
            )
    return dfeat.astype(dtype), None, None


gather_mean.defvjp(_gather_mean_fwd, _gather_mean_bwd)


def segment_max_csr(
    values: jax.Array,
    edge_src: jax.Array,
    edge_mask: jax.Array,
    num_nodes: int,
) -> jax.Array:
    """Per-destination max of per-edge ``values[E_pad, F]`` grouped by
    ``edge_src``; rows with no valid edges return 0 (guarded, quirk Q4)."""
    neg = jnp.finfo(values.dtype).min
    masked = jnp.where(edge_mask[:, None], values, neg)
    maxed = jax.ops.segment_max(masked, edge_src, num_segments=num_nodes)
    any_valid = jax.ops.segment_sum(
        edge_mask.astype(jnp.int32), edge_src, num_segments=num_nodes
    )
    return jnp.where((any_valid > 0)[:, None], maxed, jnp.zeros_like(maxed))


def spmm_mean(
    features: jax.Array,
    edge_src: jax.Array,
    edge_dst: jax.Array,
    edge_mask: jax.Array,
    num_nodes: int,
    indptr: jax.Array | None = None,
    impl: str = "auto",
    symmetric: bool = True,
) -> jax.Array:
    """Full-graph mean aggregation: ``out[v] = mean_{(v,u) in E} features[u]``.

    The row-normalized SpMM ``D^-1 A X``. Implementations:

    * ``"xla"`` — gather + segment-sum over the COO edge list. Measured
      fastest on v5e at Cora/Pubmed shapes (0.15 / 0.94 ms at F=128); XLA's
      scatter-add already runs at the hardware's ~10-cycles-per-edge floor.
    * ``"pallas_vmem"`` — the fused CSR kernel
      (:mod:`graphsage_tpu.ops.pallas_spmm`): VMEM-resident table, zero
      per-edge HBM traffic, no ``[E, F]`` intermediate. Within ~10% of XLA
      (see that module's measured-floor analysis); requires ``indptr`` and
      the table to fit VMEM.
    * ``"auto"`` — ``"xla"`` (the measured winner).
    """
    if impl == "auto":
        impl = "xla"
    if impl == "pallas_vmem":
        from graphsage_tpu.ops import pallas_spmm

        if indptr is None:
            raise ValueError("pallas_vmem spmm requires indptr")
        if not pallas_spmm.fits_vmem(num_nodes, features.shape[-1]):
            impl = "xla"
        else:
            return pallas_spmm.spmm_mean_vmem(
                features, indptr, edge_dst, symmetric,
                interpret=jax.default_backend() in ("cpu",),
            )
    if impl == "xla":
        per_edge = jnp.take(features, edge_dst, axis=0)
        return segment_mean_csr(per_edge, edge_src, edge_mask, num_nodes)
    raise ValueError(f"unknown spmm_mean impl {impl!r}")
