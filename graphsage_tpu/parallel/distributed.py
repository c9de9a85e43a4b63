"""Distributed execution: sharded training step and edge-partitioned
full-graph aggregation.

Two cooperating parallel modes (no counterpart in the single-device
reference — SURVEY.md §2.2 lists these as north-star components):

* **DP + TP sampled training** (:class:`ShardedTrainer`): the seed batch is
  split over the ``data`` axis, features and the first-layer weight over the
  ``model`` axis. One ``jit`` with NamedShardings — XLA inserts the layer-1
  all-reduce and the gradient psum.
* **Edge-partitioned full-graph aggregation**
  (:func:`sharded_spmm_mean`, :func:`distributed_full_graph_logits`): each
  shard owns a contiguous CSR edge block, computes partial segment sums
  locally, and partials all-reduce over the ``graph`` axis — the graph analog
  of sequence parallelism (SURVEY.md §5.7). Written with ``shard_map`` so the
  collective is explicit.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from graphsage_tpu.data.graph import Graph
from graphsage_tpu.models.graphsage import GraphSAGE, SAGEParams
from graphsage_tpu.parallel.mesh import graph_shardings, named, param_shardings
from graphsage_tpu.parallel.partition import EdgePartition, partition_edges
from graphsage_tpu.train.config import TrainConfig
from graphsage_tpu.train.trainer import Trainer, TrainState


# --------------------------------------------------------------------------
# Edge-partitioned aggregation (shard_map + psum)
# --------------------------------------------------------------------------

def sharded_spmm_mean(
    mesh: Mesh,
    axis: str,
    features: jax.Array,  # [N, F] replicated
    part: EdgePartition,  # leading dim == mesh.shape[axis]
    num_nodes: int,
) -> jax.Array:
    """Full-graph mean aggregation with edges sharded over ``axis``.

    Each shard: gather its edges' source features, local segment-sum into
    [N, F] partials + [N] counts; then one psum of both across the axis.
    Returns ``(mean [N, F], valid_count [N])``, both replicated.
    Differentiable (shard_map supports autodiff; the cotangent of the psum
    is the identity broadcast).
    """

    def local(feats, src, dst, mask):
        src, dst, mask = src[0], dst[0], mask[0]
        # f32 accumulation end to end (segment sums AND the cross-shard
        # psum): bf16 scatter-adds saturate near 256x the addend scale at
        # hub degrees — for the counts exactly, for same-sign numerators
        # progressively. Gather/compute stay in the compute dtype.
        w32 = mask.astype(jnp.float32)
        per_edge = jnp.take(feats, dst, axis=0).astype(jnp.float32) * w32[:, None]
        summed = jax.ops.segment_sum(per_edge, src, num_segments=num_nodes)
        count = jax.ops.segment_sum(w32, src, num_segments=num_nodes)
        summed = jax.lax.psum(summed, axis)
        count = jax.lax.psum(count, axis)
        mean = summed / jnp.maximum(count, 1.0)[:, None]
        return mean.astype(feats.dtype), count

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
    )(features, part.edge_src, part.edge_dst, part.edge_mask)


def sharded_segment_max(
    mesh: Mesh,
    axis: str,
    pooled: jax.Array,  # [N, pd] replicated (post pooling-MLP values)
    part: EdgePartition,
    num_nodes: int,
) -> tuple[jax.Array, jax.Array]:
    """Edge-partitioned guarded segment max (the maxpool analog of
    :func:`sharded_spmm_mean`): per-shard masked segment-max partials with a
    ``pmax`` cross-shard combine (identity ``-inf``), plus a psum'd valid
    count that restores the guarded empty-row zeros (quirk Q4).
    Differentiable — segment_max/pmax carry subgradients to the argmax."""

    def local(vals, src, dst, mask):
        src, dst, mask = src[0], dst[0], mask[0]
        neg = jnp.finfo(vals.dtype).min
        per_edge = jnp.where(
            mask[:, None], jnp.take(vals, dst, axis=0), neg
        )
        maxed = jax.ops.segment_max(per_edge, src, num_segments=num_nodes)
        maxed = jax.lax.pmax(maxed, axis)
        valid = jax.lax.psum(
            jax.ops.segment_sum(
                mask.astype(jnp.int32), src, num_segments=num_nodes
            ),
            axis,
        )
        out = jnp.where((valid > 0)[:, None], maxed, jnp.zeros_like(maxed))
        return out, valid

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()),
    )(pooled, part.edge_src, part.edge_dst, part.edge_mask)


def distributed_full_graph_logits(
    model: GraphSAGE,
    params: SAGEParams,
    graph: Graph,
    mesh: Mesh,
    axis: str = "graph",
    part: EdgePartition | None = None,
) -> jax.Array:
    """Full-graph forward with every aggregation edge-partitioned over
    ``axis``. Matches :meth:`GraphSAGE.forward_full_graph` allclose
    (both aggregators — BASELINE config #3's maxpool included)."""
    if model.aggregator == "lstm":
        raise ValueError(
            "edge-partitioned full-graph execution supports mean and "
            "maxpool only — an LSTM over neighbor sequences is not a "
            "per-edge segment reduction; train lstm models on the sampled "
            "paths"
        )
    if part is None:
        part = partition_edges(graph, mesh.shape[axis])
    h = graph.features
    if model.compute_dtype is not None:
        h = h.astype(model.compute_dtype)
    from graphsage_tpu.models.layers import (
        apply_full_graph_maxpool_layer,
        apply_full_graph_mean_layer,
    )

    def spmm(x):
        return sharded_spmm_mean(mesh, axis, x, part, graph.num_nodes)

    def segmax(pooled):
        return sharded_segment_max(mesh, axis, pooled, part, graph.num_nodes)

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
    logits = jnp.einsum(
        "nd,dc->nc", h, params.head.astype(h.dtype),
        preferred_element_type=jnp.float32, precision=model.matmul_precision,
    )
    return logits.astype(jnp.float32)


# --------------------------------------------------------------------------
# DP + TP sampled training
# --------------------------------------------------------------------------

class ShardedTrainer(Trainer):
    """Trainer whose jitted step runs over a mesh with DP (+ optional TP).

    The step function is identical to the single-chip one — parallelism is
    entirely expressed through input shardings; XLA partitions the program
    and inserts collectives (gradient psum over ``data``, feature-dim
    all-reduce over ``model``).
    """

    def __init__(
        self,
        model: GraphSAGE,
        graph: Graph,
        config: TrainConfig,
        mesh: Mesh,
        data_axis: str = "data",
        model_axis: str | None = "model",
    ):
        self.mesh = mesh
        self.data_axis = data_axis
        self.model_axis = model_axis if (model_axis in mesh.axis_names) else None
        super().__init__(model, graph, config)
        if config.batch_size % mesh.shape[data_axis]:
            raise ValueError(
                f"batch_size {config.batch_size} must divide over data axis "
                f"size {mesh.shape[data_axis]}"
            )
        # Re-place the PARENT-prepared graph (not the raw argument): the
        # base __init__ may have attached the auto-built layer0 cache —
        # resharding the raw arg would silently drop it.
        prepared = self.graph
        self._graph_sharding = graph_shardings(mesh, prepared, self.model_axis)
        self._seed_sharding = named(mesh, data_axis)
        self.graph = jax.device_put(prepared, self._graph_sharding)
        self._jit_step = None  # built lazily once params exist

    def _state_shardings(self, state: TrainState):
        pspec = param_shardings(
            self.mesh, state.params, self.model.in_dim, self.model_axis
        )
        repl = named(self.mesh)
        opt_spec = jax.tree_util.tree_map(lambda _: repl, state.opt_state)
        return TrainState(
            params=pspec, opt_state=opt_spec, key=repl, step=repl
        )

    def init_state(self) -> TrainState:
        state = super().init_state()
        sharded = jax.device_put(state, self._state_shardings(state))
        if self._jit_step is None:
            self._jit_step = jax.jit(
                self._train_step,
                donate_argnums=(0,),
                in_shardings=(
                    self._state_shardings(state),
                    self._graph_sharding,
                    self._seed_sharding,
                ),
                out_shardings=(self._state_shardings(state), named(self.mesh)),
            )
        return sharded

    def step(self, state: TrainState, seeds) -> tuple[TrainState, float]:
        seeds = jax.device_put(
            jnp.asarray(seeds, jnp.int32), self._seed_sharding
        )
        state, loss = self._jit_step(state, self.graph, seeds)
        return state, loss
