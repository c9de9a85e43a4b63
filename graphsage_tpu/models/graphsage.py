"""Multi-layer supervised GraphSAGE with explicit per-hop frontiers.

The reference stacks layers by *closure recursion*: layer 2's feature function
is a lambda that re-runs the whole layer-1 encoder on the sampled frontier
(reference graphsage/model.py:74-78, SURVEY.md Q11). Here the recursion is
unrolled into explicit static-shape stages:

  1. ``sample``  — build hop frontiers seeds -> hop1 -> ... -> hopL with the
     vectorized fixed-fanout sampler. Frontiers are flat ``[B * prod(k)]``
     arrays; no deduplication (recompute-tolerant gather — the measured design
     choice from SURVEY.md §2.3: dedup would force dynamic shapes).
  2. ``forward`` — gather raw features at the deepest hop, then fold layers
     inward: reshape to ``[parents, k, d]``, masked-aggregate, project, ReLU.
     Layer ``0`` corresponds to the reference's ``enc1``.
  3. a linear classification head (reference SupervisedGraphSage,
     model.py:20-37) and softmax cross-entropy.

Hop ``h`` is built with the fanout of layer ``L-h`` (0-based): the top layer's
fanout governs the first expansion — matching the reference where
``enc2.num_sample`` applies to the batch nodes and ``enc1.num_sample`` to the
hop-2 frontier.

When ``concat_self=True`` each frontier row carries the parent node in
column 0, so the previous layer's activation of *self* is available without a
second pass; in the reference's shipped pure-mean mode (quirk Q2) the column
is omitted.

``forward_full_graph`` runs the same layers over *all* nodes with full
neighborhoods via CSR segment-mean — the deterministic whole-graph inference
path (and the unit of work the edge-partitioned distributed mode shards).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from graphsage_tpu.data.graph import Graph
from graphsage_tpu.models.layers import (
    SAGELayerParams,
    apply_full_graph_mean_layer,
    apply_full_graph_maxpool_layer,
    apply_sage_layer,
    init_sage_layer,
    split_mean_weight,
)
from graphsage_tpu.ops.aggregate import (
    gather,
    gather_mean,
    segment_max_csr,
    spmm_mean,
)
from graphsage_tpu.ops.quantize import (
    dequantize,
    gather_dequant,
    gather_mean_dequant,
    is_quantized,
    project_table,
)
from graphsage_tpu.ops.sampling import sample_neighbors


class Frontier(NamedTuple):
    """Flattened hop frontiers. ``ids[0]`` is the seed batch; ``ids[h]`` has
    ``ids[h-1].size * k_h`` entries (``k_h + 1`` with a self column)."""

    ids: tuple[jax.Array, ...]
    masks: tuple[jax.Array, ...]

    @property
    def num_hops(self) -> int:
        return len(self.ids) - 1

    def sampled_edges(self) -> int:
        """Static count of sampled-edge slots (the benchmark denominator)."""
        return sum(int(m.size) for m in self.masks[1:])


@struct.dataclass
class SAGEParams:
    layers: tuple[SAGELayerParams, ...]
    head: jax.Array  # [hidden[-1], num_classes]


@dataclasses.dataclass(frozen=True)
class GraphSAGE:
    """Static model description; parameters travel separately as a pytree."""

    in_dim: int
    num_classes: int
    hidden_dims: Sequence[int] = (128, 128)
    fanouts: Sequence[int | None] = (10, 10)  # per layer; layer 0 = input-closest
    # "mean" | "maxpool" | "lstm" — the paper's full aggregator family
    # (§3.3; the reference ships only the mean). "lstm" scans the sampled
    # neighbor sequence (models/layers.py:masked_lstm); pool_dim doubles as
    # its hidden width. Sequence order: random subset order below degree
    # (fresh draw per step — the paper's random permutation), adjacency
    # order at covering fanouts (deterministic; sampled == full-graph
    # parity is exact there, test-pinned).
    aggregator: str = "mean"
    concat_self: bool = False  # False = reference shipped mode (Q2)
    # GCN-style self loops: each node's own representation joins the
    # neighbor set before the mean/max (what the reference's dead
    # ``MeanAggregator(gcn=True)`` branch *intended* before crashing on
    # ``set + set`` — SURVEY.md Q2). Mutually exclusive with concat_self.
    self_loop: bool = False
    pool_dim: int | None = None
    compute_dtype: jnp.dtype | None = None  # e.g. jnp.bfloat16 for MXU
    param_dtype: jnp.dtype = jnp.float32
    # None = platform default (bf16 inputs on TPU); "highest" = full f32,
    # required for allclose parity against the reference (SURVEY.md §4.1).
    matmul_precision: str | None = None
    # Layer-0 neighbor aggregation backend (the hot gather):
    # "auto" | "take" | "onehot_pallas" — see graphsage_tpu.ops.aggregate.
    gather_impl: str = "auto"
    # Project-then-aggregate for the mean aggregator: since the masked mean
    # is linear, ``mean(X[idx]) @ W == mean((X @ W)[idx])`` exactly — so when
    # a layer shrinks its width (1433->128 on Cora, 500->128 on Pubmed) the
    # projection runs first on the MXU (cheap, sequential reads) and every
    # gather / segment-sum / halo exchange moves d_out-wide rows instead of
    # d_in-wide: 4-11x less aggregation traffic and boundary communication.
    # "auto" = reorder whenever d_in > d_out; True/False force it.
    project_first: bool | str = "auto"
    # Full-graph SpMM backend: "auto" | "xla" | "pallas_vmem" — see
    # graphsage_tpu.ops.aggregate.spmm_mean.
    spmm_impl: str = "auto"
    # Layer-0 execution mode for the SAMPLED forward:
    #   "sampled" — per-hop frontier sampling all the way down (default;
    #     dedup-free recompute, B * prod(fanouts) deepest-hop rows).
    #   "full"    — the shared-table escape from the backward scatter floor
    #     (ROOFLINE §5.1): layer 0 runs ONCE over ALL nodes with complete
    #     neighborhoods (the CSR spmm path — scatter-free backward when the
    #     adjacency is symmetric), producing an [N, d0] table the upper
    #     layers gather from; the deepest sampling hop disappears
    #     (fanouts[0] is unused). This also matches the reference's own
    #     set.union dedup semantics (reference aggregators.py:50-51): each
    #     node's layer-0 activation is computed once, not once per frontier
    #     occurrence — identical to "sampled" at covering fanouts
    #     (test-pinned), a lower-variance estimator below them. Wins when
    #     num_edges < B * prod(fanouts) (Pubmed-shape: 89K vs 256K rows).
    #     Supported by every trainer: the sharded trainers build the table
    #     DISTRIBUTED (per-shard edge slice + all_gather of the projected
    #     rows — parallel/feature_store.py), and the halo FullGraphTrainer
    #     is the full-batch analog.
    #   "cached"  — the frozen-feature escape (ROOFLINE §5.1b): the feature
    #     table never trains (reference model.py:70-71, quirk Q12) and the
    #     mean is linear, so the deepest hop's full-neighborhood aggregate
    #     D^-1 A X is a CONSTANT per node — precomputed once by
    #     data.graph.with_cached_layer0 and gathered per step at the hop
    #     layer 1 consumes. The deepest sampling hop, its B*prod(fanouts)
    #     row gathers, AND the backward scatter into the table all
    #     disappear (M is not differentiated). Semantics: the reference's
    #     own num_sample=None mode (quirk Q7) at the input-closest layer —
    #     sampled estimator's exact expectation, equal to "sampled" at
    #     covering fanouts (test-pinned), lower variance below them.
    #     Mean aggregator only (linearity is what makes the cache exact).
    layer0: str = "sampled"
    # Multi-label classification (the paper's PPI protein-function family;
    # no reference counterpart — reference model.py:35-37 is single-label
    # softmax CE only). True switches the head objective to independent
    # per-class sigmoid BCE over multi-hot [B, C] labels and prediction to
    # per-class thresholding (logit > 0). Everything upstream of the head
    # (sampling, aggregation, sharding) is label-free and unchanged.
    multilabel: bool = False
    # Last-layer nonlinearity. "relu" matches the reference encoder (every
    # layer ReLUs — reference encoders.py:48); "linear" drops it on the
    # FINAL layer only — required by the unsupervised graph-context loss
    # (models/unsupervised.py), whose sigmoid-dot objective collapses to the
    # all-zero fixed point when embeddings are constrained nonnegative
    # (every dot >= 0, so the Q negative terms dominate and the cheapest
    # descent is z -> 0; test-pinned). Supervised training keeps "relu".
    final_activation: str = "relu"
    # Neighbor-sampling mechanism (ops/sampling.py):
    #   "floyd"    — exact uniform k-subsets (reference semantics, Q8);
    #   "topk"     — same semantics via key sort (ELL-only oracle);
    #   "windowed" — one 128-lane CSR row fetch per PARENT instead of one
    #     per sampled slot: pick the lane window containing a uniform
    #     element (P(window) ∝ its size), then sample without replacement
    #     WITHIN it. The masked-MEAN aggregation stays exactly unbiased
    #     (E[window mean] telescopes to the full neighbor mean) and
    #     per-element marginals are the uniform k/d whenever every window
    #     holds ≥ k elements; the joint is window-correlated — a
    #     documented semantics trade for ~2.5x cheaper deep-hop sampling
    #     on hub-capped graphs (docs/ROOFLINE.md §5.1a; the 1M preset's
    #     21.7 ms sampling stage). Works through the distributed
    #     owner-side sampler too (the local CSR slice carries global ids);
    #     "topk" is ELL-only and rejected by the fully sharded trainer.
    sampling: str = "floyd"

    def __post_init__(self):
        if len(self.hidden_dims) != len(self.fanouts):
            raise ValueError("hidden_dims and fanouts must have one entry per layer")
        if self.self_loop and self.concat_self:
            raise ValueError("self_loop and concat_self are mutually exclusive")
        if self.layer0 not in ("sampled", "full", "cached"):
            raise ValueError(f"unknown layer0 mode {self.layer0!r}")
        if self.aggregator == "lstm" and self.layer0 == "full":
            raise ValueError(
                "layer0='full' supports the mean and maxpool aggregators "
                "only: the shared-table build is a segment reduction over "
                "the CSR edge list, and an LSTM over every node's FULL "
                "neighbor sequence has no such scatter-free form"
            )
        if self.layer0 == "cached" and self.aggregator != "mean":
            raise ValueError(
                "layer0='cached' requires the mean aggregator: the cache "
                "is exact only because the mean is linear in the frozen "
                "features — maxpool's trainable pooling MLP and the LSTM "
                "recurrence cannot be precomputed"
            )
        if self.final_activation not in ("relu", "linear"):
            raise ValueError(
                f"unknown final_activation {self.final_activation!r}"
            )
        if self.sampling not in ("floyd", "topk", "windowed"):
            raise ValueError(f"unknown sampling method {self.sampling!r}")

    @property
    def num_layers(self) -> int:
        return len(self.hidden_dims)

    def layer_activation(self, layer: int):
        """Per-layer output nonlinearity (None = identity on the last layer
        under ``final_activation="linear"``). Every forward path — sampled,
        full-graph, layer0-full, edge-partitioned, halo — routes through
        this so the modes stay allclose to each other."""
        if self.final_activation == "linear" and layer == self.num_layers - 1:
            return None
        return jax.nn.relu

    def use_project_first(self, layer: int, d_in: int) -> bool:
        """Whether layer ``layer`` aggregates after projecting (mean only).

        The ``"auto"`` rule here is the *traffic* heuristic (project when the
        layer shrinks its width) — the right call for the full-graph and
        sharded paths, where projecting first also shrinks every boundary
        exchange. The sampled single-chip layer 0 uses the backward-aware
        :meth:`_sampled_layer0_project_first` instead (see there)."""
        if self.aggregator != "mean":
            return False
        if self.project_first == "auto":
            return d_in > self.hidden_dims[layer]
        return bool(self.project_first)

    def injected_layer0_project_first(self, quantized: bool) -> bool:
        """Project-first decision for INJECTED gather paths (the node-sharded
        feature store), where the choice is comm-driven: projecting first
        makes every cross-shard exchange move ``4*d0``-byte f32 table rows
        instead of feature rows. Dense tables keep the width heuristic
        (``d_in > d0`` — byte-identical rows at f32, the measured default);
        int8 tables compare actual bytes: a raw feature row is ``F + 4``
        bytes (int8 + scale), so projecting only pays when ``4*d0`` is
        smaller than THAT."""
        if self.aggregator != "mean":
            return False
        if self.project_first != "auto":
            return bool(self.project_first)
        if not quantized:
            return self.in_dim > self.hidden_dims[0]
        return 4 * self.hidden_dims[0] < self.in_dim + 4

    def _sampled_layer0_project_first(
        self, num_nodes: int, slots: int, feat_bytes: int
    ) -> bool:
        """Backward-aware project-first decision for the SAMPLED layer 0.

        The feature table is frozen (reference model.py:70-71,
        requires_grad=False — Q12), which makes the two orderings sharply
        asymmetric in the backward:

        * mean-first  — ``agg = mean(X[idx]); h = agg @ W``: the backward is
          one ``[f, B] @ [B, d]`` matmul on the saved ``agg`` residual; the
          feature-table cotangent is never staged (X is not differentiated).
        * project-first — ``T = X @ W; h = mean(T[idx])``: ``T`` IS a
          function of ``W``, so the backward must materialize ``dT`` with a
          ``slots``-row scatter into ``[N, d]`` (or a dense one-hot pass)
          and then run the ``[f, N] @ [N, d]`` dW matmul over ALL N rows.

        So project-first only pays when its forward saving (gathering d-wide
        instead of f-wide rows) exceeds that backward cost — true when the
        frontier is much larger than the graph (Cora/Pubmed: B*k >> N),
        false at Reddit-like shapes (B*k < N, wide f). Constants are the
        v5e measurements from docs/ROOFLINE.md (~200 GB/s effective gather
        stream; scatter ~0.5 ms + 8.6 ns/row at 128 lanes; dense transposed
        one-hot ~30 TFLOP/s; MXU ~45 TFLOP/s effective at these sizes), and
        mean-first must win by 1.5x before auto flips away from the
        traffic heuristic — at shapes where the model says "wash"
        (Pubmed-intent: ~2.8 vs ~4.1 ms) the measured steps really are a
        wash and the established path keeps its pinned numbers.
        """
        if self.aggregator != "mean":
            return False
        if self.project_first != "auto":
            return bool(self.project_first)
        f, d = self.in_dim, self.hidden_dims[0]
        if f <= d:
            return False  # no forward saving at all
        BW, MXU, ONEHOT = 200e9, 45e12, 30e12
        lane_scale = max(1.0, d / 128.0)
        project_pass = (
            num_nodes * (feat_bytes + 4 * d) / BW + 2 * num_nodes * f * d / MXU
        )
        scatter = 5e-4 + 8.6e-9 * slots * lane_scale
        onehot = 2.0 * num_nodes * slots * d / ONEHOT + 2e-4
        p_cost = (
            project_pass  # forward table build
            + slots * 4 * d / BW  # gather d-wide f32 rows
            + min(scatter, onehot)  # dT materialization (bwd dispatch)
            + project_pass  # dW = X^T dT over all N rows
        )
        b_out = max(slots // max(self.fanouts[0] or 1, 1), 1)
        m_cost = (
            slots * feat_bytes / BW  # gather f-wide rows
            + 2 * b_out * f * d / MXU  # project after mean
            + 2 * b_out * f * d / MXU  # dW on the [B, f] residual
        )
        return not (m_cost * 1.5 < p_cost)

    # ---------------------------------------------------------------- init
    def init(self, key: jax.Array) -> SAGEParams:
        keys = jax.random.split(key, self.num_layers + 1)
        layers = []
        d_in = self.in_dim
        for l, d_out in enumerate(self.hidden_dims):
            layers.append(
                init_sage_layer(
                    keys[l],
                    d_in,
                    d_out,
                    aggregator=self.aggregator,
                    concat_self=self.concat_self,
                    pool_dim=self.pool_dim,
                    param_dtype=self.param_dtype,
                )
            )
            d_in = d_out
        glorot = jax.nn.initializers.glorot_uniform()
        head = glorot(keys[-1], (d_in, self.num_classes), self.param_dtype)
        return SAGEParams(layers=tuple(layers), head=head)

    # -------------------------------------------------------------- sample
    def sample(self, key: jax.Array, graph: Graph, seeds: jax.Array) -> Frontier:
        """Expand seed nodes into per-hop frontiers (static shapes).

        With ``layer0="full"`` or ``"cached"`` the deepest hop is skipped —
        layer 0 reads a per-node table (recomputed per step / frozen
        precompute respectively), so the frontier stops at the hop
        layer 1 consumes."""
        seeds = seeds.reshape(-1)
        ids: list[jax.Array] = [seeds]
        masks: list[jax.Array] = [jnp.ones(seeds.shape, dtype=bool)]
        L = self.num_layers
        hops = L - 1 if self.layer0 in ("full", "cached") else L
        hop_keys = jax.random.split(key, max(hops, 1))
        for h in range(1, hops + 1):
            fanout = self.fanouts[L - h]
            parent_ids, parent_mask = ids[-1], masks[-1]
            nids, nmask = sample_neighbors(
                hop_keys[h - 1], graph.neighbors, graph.degrees, parent_ids, fanout,
                method=self.sampling,
                indptr=graph.indptr, edge_dst=graph.edge_dst,
                ell_covers_all=graph.ell_covers_all,
            )
            nmask = nmask & parent_mask[:, None]
            if self.concat_self or self.self_loop:
                # Column 0 carries the parent: concat_self splits it off for
                # the concat branch; self_loop leaves it *inside* the mean/max.
                nids = jnp.concatenate([parent_ids[:, None], nids], axis=1)
                nmask = jnp.concatenate([parent_mask[:, None], nmask], axis=1)
            ids.append(nids.reshape(-1))
            masks.append(nmask.reshape(-1))
        return Frontier(ids=tuple(ids), masks=tuple(masks))

    # ---------------------------------------------------- layer-0 full table
    def layer0_full_table(
        self,
        params: SAGEParams,
        features: jax.Array,
        *,
        spmm=None,
        segmax=None,
        graph: Graph | None = None,
    ) -> jax.Array:
        """The shared layer-0 table for ``layer0="full"``: one full-graph
        layer over ``features`` rows -> ``[N(_local), d0]``.

        Default closures read ``graph``'s CSR (the single-chip path);
        distributed callers inject ``spmm``/``segmax`` closures over their
        shard-local edge slice instead (``features`` is then the chip's
        node-range rows and the result is the LOCAL table slice — see
        parallel/feature_store.py). Keeping the layer math in
        ``apply_full_graph_*_layer`` is what guarantees the sharded table
        stays allclose to the replicated one."""
        if self.layer0 != "full":
            raise ValueError("layer0_full_table requires layer0='full'")
        quantized = is_quantized(features)
        if self.aggregator == "mean":
            if spmm is None:
                if graph is None:
                    raise ValueError(
                        "layer0='full' needs forward(..., graph=...) — the "
                        "full-graph layer 0 reads the CSR adjacency"
                    )

                def spmm(x):
                    mean = spmm_mean(
                        x, graph.edge_src, graph.edge_dst, graph.edge_mask,
                        graph.num_nodes, indptr=graph.indptr,
                        impl=self.spmm_impl, symmetric=graph.symmetric,
                    )
                    return mean, graph.degrees

            pf = self.use_project_first(0, self.in_dim)
            if quantized and pf:
                # Int8 project-first: contract the raw int8 table against
                # each weight slice (no dense [N, F] transient; half the
                # table read) and run the SAME spmm closure — the pf branch
                # of apply_full_graph_mean_layer restated on project_table
                # (pinned equal in tests/test_quantize.py).
                h_dtype = self.compute_dtype or params.layers[0].weight.dtype
                w = params.layers[0].weight.astype(h_dtype)
                w_self, w_neigh = split_mean_weight(
                    w, self.in_dim, self.concat_self
                )
                hp = project_table(
                    features, w_neigh, precision=self.matmul_precision
                ).astype(h_dtype)
                mean, cnt = spmm(hp)
                pre = mean.astype(jnp.float32)
                if self.self_loop:
                    c = cnt.astype(jnp.float32)[..., None]
                    pre = (pre * c + hp.astype(jnp.float32)) / (c + 1.0)
                if self.concat_self:
                    pre = pre + project_table(
                        features, w_self, precision=self.matmul_precision
                    )
                act0 = self.layer_activation(0) or (lambda x: x)
                return act0(pre).astype(h_dtype)
            h0 = (
                dequantize(features, self.compute_dtype or jnp.float32)
                if quantized
                else features
            )
            if self.compute_dtype is not None:
                h0 = h0.astype(self.compute_dtype)
            return apply_full_graph_mean_layer(
                params.layers[0], h0, spmm,
                concat_self=self.concat_self,
                self_loop=self.self_loop,
                project_first=pf,
                precision=self.matmul_precision,
                activation=self.layer_activation(0),
            )
        # Maxpool (and the non-mean fallthrough) read dense rows: quantized
        # tables dequantize into a transient for the one full-graph pass
        # (the resident table stays int8).
        h0 = (
            dequantize(features, self.compute_dtype or jnp.float32)
            if quantized
            else features
        )
        if self.compute_dtype is not None:
            h0 = h0.astype(self.compute_dtype)
        # Maxpool layer 0: per-node pooling MLP once over all nodes,
        # per-edge gather + guarded segment-max (same closure as
        # forward_full_graph). The backward of segment_max is still a
        # scatter (argmax routing) — only the mean variant is scatter-free —
        # but the dedup win (each node pooled once, not once per frontier
        # slot) applies identically.
        if segmax is None:
            if graph is None:
                raise ValueError(
                    "layer0='full' needs forward(..., graph=...) — the "
                    "full-graph layer 0 reads the CSR adjacency"
                )

            def segmax(pooled):
                per_edge = jnp.take(pooled, graph.edge_dst, axis=0)
                agg = segment_max_csr(
                    per_edge, graph.edge_src, graph.edge_mask,
                    graph.num_nodes,
                )
                return agg, None

        return apply_full_graph_maxpool_layer(
            params.layers[0], h0, segmax,
            concat_self=self.concat_self,
            self_loop=self.self_loop,
            precision=self.matmul_precision,
            activation=self.layer_activation(0),
        )

    # ------------------------------------------------------------- forward
    def forward(
        self,
        params: SAGEParams,
        features: jax.Array,
        frontier: Frontier,
        return_embeddings: bool = False,
        *,
        gather_fn=None,
        gather_mean_fn=None,
        graph: Graph | None = None,
        layer0_table: jax.Array | None = None,
    ) -> jax.Array:
        """Logits ``[B, num_classes]`` for the frontier's seed batch
        (or the pre-head representations with ``return_embeddings``).

        ``graph`` supplies the adjacency for ``layer0="full"`` (the
        shared-table layer-0 runs a full-graph CSR layer before gathering);
        the sampled default ignores it.

        ``gather_fn(table, ids, mask)`` / ``gather_mean_fn(table, ids, mask)``
        (``mask`` marks padded frontier slots whose rows are
        garbage-tolerated downstream)
        override the feature-table lookup primitives — the injection point
        for the node-sharded feature store (parallel/feature_store.py),
        whose versions exchange requested rows across shards while
        ``features`` is only this chip's node-range slice. Defaults are the
        local single-table ops (the reference's ``nn.Embedding`` lookup
        role, model.py:70-71).
        """
        # The backward-aware layer-0 ordering only applies on the local
        # single-table path: injected gather fns (the sharded feature store)
        # see a node-range SLICE here, and their project-first choice is
        # comm-driven (made in parallel/feature_store.py).
        default_gathers = gather_fn is None and gather_mean_fn is None
        quantized = is_quantized(features)
        if gather_fn is None:
            # Dispatch on the *table* type, not on `quantized`: the same fn
            # also gathers from computed dense tables (layer-0 table,
            # projected self-table) inside a quantized forward.
            gather_fn = lambda table, ids, mask=None: (
                gather_dequant(table, ids)
                if is_quantized(table)
                else gather(table, ids)
            )
        if gather_mean_fn is None:
            dense_gm = functools.partial(
                gather_mean,
                impl=self.gather_impl,
                bf16=self.compute_dtype == jnp.bfloat16,
            )
            gather_mean_fn = lambda table, idx, mask: (
                gather_mean_dequant(table, idx, mask)
                if is_quantized(table)
                else dense_gm(table, idx, mask)
            )
        L = self.num_layers
        start_l = 0
        if self.layer0 == "cached":
            # Frozen-feature cache: the deepest hop's full-neighborhood mean
            # D^-1 A X was precomputed ONCE (data.graph.with_cached_layer0 —
            # exact, quirk Q12 + linearity), so layer 0 is gather + combine +
            # project at the hop layer 1 consumes. No deepest sampling hop,
            # no B*prod(fanouts) raw-row gather, and no backward scatter
            # (the cache is not differentiated).
            table = layer0_table
            if table is None:
                if graph is None or graph.layer0_cache is None:
                    raise ValueError(
                        "layer0='cached' needs the precomputed aggregate "
                        "table: pass forward(..., graph=...) where graph was "
                        "built with with_cached_layer0(graph), or inject "
                        "layer0_table= directly"
                    )
                if bool(graph.layer0_cache_self_loop) != self.self_loop:
                    raise ValueError(
                        "graph.layer0_cache was built with self_loop="
                        f"{graph.layer0_cache_self_loop} but the model has "
                        f"self_loop={self.self_loop} — rebuild the cache "
                        "with the matching flavor"
                    )
                table = graph.layer0_cache
            agg = gather_fn(table, frontier.ids[L - 1], frontier.masks[L - 1])
            self_h = (
                gather_fn(features, frontier.ids[L - 1], frontier.masks[L - 1])
                if self.concat_self
                else None
            )
            h = apply_sage_layer(
                params.layers[0],
                self_h,
                None,
                None,
                aggregator="mean",
                concat_self=self.concat_self,
                compute_dtype=self.compute_dtype,
                precision=self.matmul_precision,
                precomputed_agg=agg,
                activation=self.layer_activation(0),
            )
            start_l = 1
        elif self.layer0 == "full":
            # Shared-table layer 0: one full-graph CSR layer over ALL nodes
            # (scatter-free backward on symmetric adjacency for the mean),
            # then the upper layers gather hop rows from the [N, d0] table.
            # ``layer0_table`` short-circuits the computation — the sharded
            # trainers build the LOCAL table slice inside shard_map (with a
            # cross-shard spmm) and the gather_fn exchanges d0-wide rows.
            table = (
                layer0_table
                if layer0_table is not None
                else self.layer0_full_table(params, features, graph=graph)
            )
            h = gather_fn(table, frontier.ids[L - 1], frontier.masks[L - 1])
            start_l = 1
        elif self.aggregator == "mean":
            # Fused deepest-hop aggregation: the raw-feature gather + masked
            # mean collapse into one op (Pallas one-hot matmul on TPU) —
            # layer 0 then only combines + projects.
            n_out = frontier.ids[L - 1].shape[0]
            k_cols = frontier.ids[L].shape[0] // n_out
            ids2 = frontier.ids[L].reshape(n_out, k_cols)
            m2 = frontier.masks[L].reshape(n_out, k_cols)
            if self.concat_self:
                neigh_ids, neigh_mask = ids2[:, 1:], m2[:, 1:]
            else:
                neigh_ids, neigh_mask = ids2, m2
            pf = (
                self._sampled_layer0_project_first(
                    features.shape[0],
                    int(neigh_ids.size),
                    self.in_dim * jnp.dtype(features.dtype).itemsize
                    + (4 if quantized else 0),
                )
                if default_gathers
                else self.injected_layer0_project_first(quantized)
            )
            if pf:
                # Project the whole table to d_out once on the MXU, then
                # gather/aggregate narrow rows (exact: the mean is linear).
                # Quantized tables project WITHOUT dequantizing first —
                # per-row scales commute with the row-wise matmul
                # (ops/quantize.py:project_table; scale applied once, in
                # f32, after the int8 contraction).
                p0 = params.layers[0]
                w0 = p0.weight
                if self.compute_dtype is not None:
                    w0 = w0.astype(self.compute_dtype)
                w_self, w_neigh = split_mean_weight(w0, self.in_dim, self.concat_self)
                if quantized:
                    project = functools.partial(
                        project_table, features, precision=self.matmul_precision
                    )
                else:
                    feats = features
                    if self.compute_dtype is not None:
                        feats = feats.astype(self.compute_dtype)
                    project = lambda w: jnp.einsum(
                        "nf,fo->no", feats, w,
                        preferred_element_type=jnp.float32,
                        precision=self.matmul_precision,
                    ).astype(jnp.float32)
                table = project(w_neigh)
                pre = gather_mean_fn(table, neigh_ids, neigh_mask)
                if self.concat_self:
                    pre = pre + gather_fn(
                        project(w_self), frontier.ids[L - 1], frontier.masks[L - 1]
                    )
                # Keep activations in compute_dtype when set (mirrors
                # apply_full_graph_mean_layer's .astype(h.dtype)) so bf16
                # carries through the remaining layers.
                act0 = self.layer_activation(0) or (lambda x: x)
                h = act0(pre).astype(
                    self.compute_dtype
                    if self.compute_dtype is not None
                    else params.layers[0].weight.dtype
                )
            else:
                if self.concat_self:
                    self_h = gather_fn(
                        features, frontier.ids[L - 1], frontier.masks[L - 1]
                    )
                    if self.compute_dtype is not None:
                        self_h = self_h.astype(self.compute_dtype)
                else:
                    self_h = None
                agg = gather_mean_fn(features, neigh_ids, neigh_mask)
                h = apply_sage_layer(
                    params.layers[0],
                    self_h,
                    None,
                    None,
                    aggregator=self.aggregator,
                    concat_self=self.concat_self,
                    compute_dtype=self.compute_dtype,
                    precision=self.matmul_precision,
                    precomputed_agg=agg,
                    activation=self.layer_activation(0),
                )
            start_l = 1
        else:
            h = gather_fn(features, frontier.ids[L], frontier.masks[L])
            if self.compute_dtype is not None:
                h = h.astype(self.compute_dtype)
        for l in range(start_l, L):
            hop_in = L - l  # activations currently live at this hop
            n_out = frontier.ids[hop_in - 1].shape[0]
            k_cols = frontier.ids[hop_in].shape[0] // n_out
            h3 = h.reshape(n_out, k_cols, h.shape[-1])
            m3 = frontier.masks[hop_in].reshape(n_out, k_cols)
            if self.concat_self:
                self_h, neigh, nm = h3[:, 0], h3[:, 1:], m3[:, 1:]
            else:
                self_h, neigh, nm = None, h3, m3
            h = apply_sage_layer(
                params.layers[l],
                self_h,
                neigh,
                nm,
                aggregator=self.aggregator,
                concat_self=self.concat_self,
                compute_dtype=self.compute_dtype,
                precision=self.matmul_precision,
                activation=self.layer_activation(l),
            )
        if return_embeddings:
            return h.astype(jnp.float32)
        logits = jnp.einsum(
            "bd,dc->bc", h, params.head.astype(h.dtype),
            preferred_element_type=jnp.float32, precision=self.matmul_precision,
        )
        return logits.astype(jnp.float32)

    def apply(
        self, params: SAGEParams, key: jax.Array, graph: Graph, seeds: jax.Array
    ) -> jax.Array:
        """sample + forward in one call (training/eval hot path)."""
        frontier = self.sample(key, graph, seeds)
        return self.forward(params, graph.features, frontier, graph=graph)

    # ------------------------------------------------------------ embeddings
    def embed(
        self, params: SAGEParams, key: jax.Array, graph: Graph, seeds: jax.Array
    ) -> jax.Array:
        """Node representations ``[B, hidden[-1]]`` (the layer the head
        consumes — what the reference exposes as ``enc(nodes)``,
        model.py:31). Sampled path; for deterministic full-neighborhood
        embeddings of every node use :meth:`embed_full_graph`."""
        frontier = self.sample(key, graph, seeds)
        return self.forward(
            params, graph.features, frontier, return_embeddings=True,
            graph=graph,
        )

    def embed_full_graph(self, params: SAGEParams, graph: Graph) -> jax.Array:
        """Deterministic embeddings ``[N, hidden[-1]]`` for every node."""
        return self.forward_full_graph(params, graph, return_embeddings=True)

    # --------------------------------------------------------- full graph
    def forward_full_graph(
        self,
        params: SAGEParams,
        graph: Graph,
        return_embeddings: bool = False,
        spmm_override=None,  # callable x -> (neigh_mean, valid_count); mean only
        segmax_override=None,  # callable pooled -> (neigh_max, valid); maxpool only
    ) -> jax.Array:
        """Deterministic logits for every node, using complete neighborhoods.

        Equivalent to the reference with ``num_sample=None`` (quirk Q7) run on
        all nodes — the basis of the numerical-parity tests and of the
        edge-partitioned distributed mode. Supports all three aggregators:
        mean via CSR segment-mean, maxpool via per-node MLP + per-edge
        segment-max (the SDDMM-style formulation), lstm via a scan over the
        ELL neighbor columns (needs ``graph.ell_covers_all`` — hub-capped
        graphs must use sampled eval instead; the sequence order is the ELL
        adjacency order, which is exactly what covering-fanout sampling
        produces, so sampled == full-graph parity is exact).
        """
        if self.aggregator == "lstm":
            if spmm_override is not None or segmax_override is not None:
                raise ValueError(
                    "the edge-partitioned/halo full-graph paths support "
                    "mean and maxpool only — an LSTM over neighbor "
                    "sequences is not a per-edge segment reduction"
                )
            if not graph.ell_covers_all:
                raise ValueError(
                    "full-graph forward with aggregator='lstm' needs the "
                    "ELL table to cover every neighbor (this graph is "
                    "hub-capped); evaluate with sampled neighborhoods "
                    "(eval_fanouts) instead"
                )
        h = (
            dequantize(graph.features, self.compute_dtype or jnp.float32)
            if is_quantized(graph.features)
            else graph.features
        )
        if self.compute_dtype is not None:
            h = h.astype(self.compute_dtype)
        def spmm(x):
            if spmm_override is not None:
                return spmm_override(x)
            mean = spmm_mean(
                x, graph.edge_src, graph.edge_dst, graph.edge_mask,
                graph.num_nodes, indptr=graph.indptr, impl=self.spmm_impl,
                symmetric=graph.symmetric,
            )
            return mean, graph.degrees

        def segmax(pooled):
            # per-node MLP already applied; per-edge gather + guarded
            # segment max over the COO edge list.
            if segmax_override is not None:
                return segmax_override(pooled)
            per_edge = jnp.take(pooled, graph.edge_dst, axis=0)
            agg = segment_max_csr(
                per_edge, graph.edge_src, graph.edge_mask, graph.num_nodes
            )
            return agg, None

        for l in range(self.num_layers):
            p = params.layers[l]
            d_in = h.shape[-1]
            if self.aggregator == "mean":
                h = apply_full_graph_mean_layer(
                    p, h, spmm,
                    concat_self=self.concat_self,
                    self_loop=self.self_loop,
                    project_first=self.use_project_first(l, d_in),
                    precision=self.matmul_precision,
                    activation=self.layer_activation(l),
                )
                continue
            if self.aggregator == "lstm":
                width = graph.neighbors.shape[-1]
                ell_mask = (
                    jnp.arange(width, dtype=jnp.int32)[None, :]
                    < jnp.minimum(graph.degrees, width)[:, None]
                )
                seq = jnp.take(h, graph.neighbors, axis=0)  # [N, K, d]
                mask = ell_mask
                if self.self_loop:
                    # Parent first in the sequence — same slot the sampler
                    # gives it (column 0 of the hop row).
                    seq = jnp.concatenate([h[:, None, :], seq], axis=1)
                    mask = jnp.concatenate(
                        [jnp.ones((h.shape[0], 1), bool), mask], axis=1
                    )
                h = apply_sage_layer(
                    p,
                    h if self.concat_self else None,
                    seq,
                    mask,
                    aggregator="lstm",
                    concat_self=self.concat_self,
                    precision=self.matmul_precision,
                    activation=self.layer_activation(l),
                )
                continue
            h = apply_full_graph_maxpool_layer(
                p, h, segmax,
                concat_self=self.concat_self,
                self_loop=self.self_loop,
                precision=self.matmul_precision,
                activation=self.layer_activation(l),
            )
        if return_embeddings:
            return h.astype(jnp.float32)
        logits = jnp.einsum(
            "nd,dc->nc", h, params.head.astype(h.dtype),
            preferred_element_type=jnp.float32, precision=self.matmul_precision,
        )
        return logits.astype(jnp.float32)

    # ----------------------------------------------------------------- loss
    def loss(
        self,
        params: SAGEParams,
        features: jax.Array,
        frontier: Frontier,
        labels: jax.Array,
        *,
        gather_fn=None,
        gather_mean_fn=None,
        graph: Graph | None = None,
        layer0_table: jax.Array | None = None,
    ) -> jax.Array:
        """Mean softmax cross-entropy (reference model.py:35-37), or mean
        sigmoid BCE over multi-hot labels under ``multilabel=True``."""
        logits = self.forward(
            params, features, frontier,
            gather_fn=gather_fn, gather_mean_fn=gather_mean_fn, graph=graph,
            layer0_table=layer0_table,
        )
        return self.classification_loss(logits, labels).mean()

    def classification_loss(self, logits: jax.Array, labels: jax.Array) -> jax.Array:
        """Per-example classification loss ``[B]`` — the one head objective
        every trainer (sampled, full-graph, sharded) routes through.

        Single-label: softmax CE on integer labels (reference model.py:35-37).
        Multilabel: mean-over-classes sigmoid BCE on multi-hot ``[B, C]``
        labels (the paper's PPI objective)."""
        if self.multilabel:
            if labels.ndim != 2:
                raise ValueError(
                    f"multilabel=True needs multi-hot [B, C] labels, got "
                    f"shape {labels.shape} — build the graph with 2-D labels"
                )
            return optax.sigmoid_binary_cross_entropy(
                logits, labels.astype(logits.dtype)
            ).mean(axis=-1)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels.reshape(-1)
        )

    def predictions(self, logits) -> np.ndarray:
        """Host-side class decisions from logits: argmax (single-label,
        reference model.py:105) or per-class ``logit > 0`` multi-hot
        (multilabel — sigmoid threshold 0.5)."""
        logits = np.asarray(logits)
        if self.multilabel:
            return (logits > 0).astype(np.int8)
        return logits.argmax(axis=-1)
