"""Serving engine: low-latency inference on a trained GraphSAGE model.

The reference's only inference surface is ``graphsage.forward(val)`` inside
its training script (reference graphsage/model.py:104-105) — one stochastic
sampled forward on whatever nodes the script asks about. This module makes
serving a first-class engine with the two deployment shapes that matter on
TPU:

* ``mode="table"`` (default) — the **embedding-table** tier: one
  deterministic full-graph forward (complete neighborhoods, quirk Q7
  semantics) refreshes an ``[N, d_L]`` embedding table per parameter
  update, and every request after that is a single row gather plus the
  ``[d_L, C]`` head matmul. Request cost is O(B·d_L) — no sampling, no
  aggregation, no graph traversal; the whole-graph refresh is the
  amortized cost (~13 ms at 100K nodes / 2M edge slots, docs/SERVING.md).
  This is the TPU-native answer to "score nodes against the current
  model": the MXU-heavy work happens once per model version, off the
  request path.

* ``mode="sampled"`` — the reference-observable stochastic forward
  (SURVEY §3.3: the reference samples at eval time too), jitted with a
  fixed key so identical requests return identical answers. Per-request
  cost scales with ``B·prod(fanouts)``; ``layer0="full"`` models reuse
  their shared-table layer 0 automatically.

Pass ``mesh=`` to make the table tier **sharded**: the refresh runs the
halo-exchange full-graph forward over a node partition (features enter
shard-stacked — ``N/S·F`` rows per chip, boundary rows exchanged per
layer) and the resulting table stays ``[S, N/S, d_L]``-sharded; requests
gather rows cross-shard (XLA inserts the collective). Nothing graph-sized
is replicated on any chip — the serving counterpart of the sharded
trainers' memory story (docs/DISTRIBUTED.md).

Requests pad to a small set of static batch **buckets**, so steady-state
serving never recompiles (XLA traces once per bucket, not per request
size).

Checkpoints: restore a ``TrainState`` with
``graphsage_tpu.utils.checkpoint.restore_checkpoint`` (the deployment loop
in docs/SERVING.md) and hand ``state.params`` to the engine; ``refresh``
swaps parameters on a live engine.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from graphsage_tpu.data.graph import Graph
from graphsage_tpu.models.graphsage import GraphSAGE, SAGEParams
from graphsage_tpu.ops.quantize import is_quantized, quantize_rows


class ServingEngine:
    """Compiled request path over a trained model. See module docstring.

    Parameters
    ----------
    model, graph : the trained architecture and the (serving-time) graph.
        Host-resident graphs (``placement="host"``) are device-placed once
        at construction — serving reads them on every refresh/request.
    params : trained :class:`SAGEParams` (e.g. ``state.params`` from a
        restored checkpoint).
    mode : ``"table"`` or ``"sampled"``.
    batch_buckets : static request sizes to compile for; a request pads to
        the smallest bucket that fits (or to a multiple of the largest).
    eval_fanouts : sampled mode only — override the model's training
        fanouts for serving (``None`` entries mean full neighborhoods).
    seed : sampled mode only — fixes the sampling key (identical requests
        return identical answers; vary per engine to decorrelate replicas).
    mesh, axis, partition : table mode only — shard the tier over
        ``mesh.shape[axis]`` chips (module docstring). ``partition`` is a
        prebuilt :class:`NodePartition`; by default one is built with the
        auto halo levers (``order="auto"``).
    quantize_table : table mode only — store the refreshed ``[N, d_L]``
        embedding table as int8 + per-row f32 scales (4x less resident,
        int8 request gathers). The head matmul consumes dequantized rows;
        per-request logits shift by at most the embedding quantization
        error (scale/2 per element) — predictions on well-separated
        classes are unaffected (test-pinned agreement bound).
    """

    def __init__(
        self,
        model: GraphSAGE,
        graph: Graph,
        params: SAGEParams,
        *,
        mode: str = "table",
        batch_buckets: tuple[int, ...] = (256, 1024),
        eval_fanouts: tuple[int | None, ...] | None = None,
        seed: int = 0,
        mesh=None,
        axis: str = "graph",
        partition=None,
        quantize_table: bool = False,
    ):
        if mode not in ("table", "sampled"):
            raise ValueError(f"unknown serving mode {mode!r}")
        if not batch_buckets or any(b <= 0 for b in batch_buckets):
            raise ValueError("batch_buckets must be positive ints")
        if mesh is not None and mode != "table":
            raise ValueError(
                "sharded serving is table-mode only (sampled serving at "
                "scale is FullyShardedTrainer.predict)"
            )
        if quantize_table and mode != "table":
            raise ValueError("quantize_table requires mode='table'")
        self.model = model
        self.mode = mode
        self.quantize_table = quantize_table
        self.buckets = tuple(sorted(set(int(b) for b in batch_buckets)))
        self.params = params
        self._key = jax.random.PRNGKey(seed + 7)  # Trainer's eval key rule
        self._table = None
        self.mesh = mesh
        self._pos = None  # global id -> table row (sharded tier)

        if mesh is not None:
            # Sharded table tier: halo full-graph refresh over a node
            # partition (the graph never needs device placement here — the
            # partition's stacked payloads are the only graph-sized device
            # arrays, and they shard). Positions remap through the
            # partition's stacked layout on the host.
            from graphsage_tpu.parallel.halo import (
                build_node_partition,
                halo_full_graph_logits,
            )

            self.graph = graph
            if partition is None:
                partition = build_node_partition(
                    graph, mesh.shape[axis], order="auto"
                )
            self.partition = partition
            self._h0_payload = partition.h0  # jit ARG (never a constant)

            def _refresh(p, h0):
                t = halo_full_graph_logits(
                    model, p, partition, mesh, axis, h0=h0,
                    return_embeddings=True, stacked=True,
                )
                return quantize_rows(t) if self.quantize_table else t

            self._refresh_jit = jax.jit(_refresh)
            self._pos = np.asarray(partition.stacked_index)

            def _serve(table, head, pos):
                if is_quantized(table):
                    d = table.q.shape[-1]
                    rows = jnp.take(
                        table.q.reshape(-1, d), pos, axis=0
                    ).astype(jnp.float32) * jnp.take(
                        table.scale.reshape(-1, 1), pos, axis=0
                    )
                else:
                    flat = table.reshape(-1, table.shape[-1])
                    rows = jnp.take(flat, pos, axis=0)
                logits = jnp.einsum(
                    "bd,dc->bc", rows, head.astype(rows.dtype),
                    preferred_element_type=jnp.float32,
                    precision=self.model.matmul_precision,
                )
                return rows, logits.astype(jnp.float32)

            self._serve_jit = jax.jit(_serve)
            self.refresh(params)
            return

        self.graph = graph.to_device() if graph.on_host else graph
        if mode == "table":

            def _refresh(p, g):
                t = self.model.embed_full_graph(p, g)
                return quantize_rows(t) if self.quantize_table else t

            self._refresh_jit = jax.jit(_refresh)

            def _serve(table, head, ids):
                if is_quantized(table):
                    rows = jnp.take(table.q, ids, axis=0).astype(
                        jnp.float32
                    ) * jnp.take(table.scale, ids, axis=0)
                else:
                    rows = jnp.take(table, ids, axis=0)
                logits = jnp.einsum(
                    "bd,dc->bc", rows, head.astype(rows.dtype),
                    preferred_element_type=jnp.float32,
                    precision=self.model.matmul_precision,
                )
                return rows, logits.astype(jnp.float32)

            self._serve_jit = jax.jit(_serve)
        else:
            smodel = model
            if eval_fanouts is not None:
                smodel = dataclasses.replace(model, fanouts=tuple(eval_fanouts))
            self._smodel = smodel

            def _serve(params, key, graph, seeds):
                frontier = smodel.sample(key, graph, seeds)
                embeds = smodel.forward(
                    params, graph.features, frontier,
                    return_embeddings=True, graph=graph,
                )
                logits = jnp.einsum(
                    "bd,dc->bc", embeds, params.head.astype(embeds.dtype),
                    preferred_element_type=jnp.float32,
                    precision=smodel.matmul_precision,
                )
                return embeds, logits.astype(jnp.float32)

            self._serve_jit = jax.jit(_serve)
        self.refresh(params)

    # ------------------------------------------------------------- refresh
    def refresh(self, params: SAGEParams) -> None:
        """Install new parameters (one full-graph forward in table mode —
        the per-model-update cost; free in sampled mode)."""
        self.params = params
        if self.mesh is not None:
            self._table = self._refresh_jit(params, self._h0_payload)
        elif self.mode == "table":
            self._table = self._refresh_jit(params, self.graph)

    @property
    def table(self) -> jax.Array | None:
        """The current embedding table (table mode): ``[N, d_L]``, or the
        shard-stacked ``[S, N/S, d_L]`` sharded array under ``mesh=`` (row
        of global node ``v`` = ``partition.stacked_index[v]`` after
        flattening). For bulk export or downstream tasks."""
        return self._table

    # ------------------------------------------------------------ requests
    def _pad(self, nodes) -> tuple[jax.Array, int]:
        ids = np.asarray(nodes, dtype=np.int32).reshape(-1)
        n = ids.shape[0]
        if n == 0:
            raise ValueError("empty request")
        for b in self.buckets:
            if n <= b:
                padded = b
                break
        else:
            big = self.buckets[-1]
            padded = -(-n // big) * big
        out = np.zeros(padded, np.int32)
        out[:n] = ids
        return out, n

    def _logits(self, nodes) -> tuple[jax.Array, jax.Array, int]:
        ids_np, n = self._pad(nodes)
        if self._pos is not None:
            # Sharded tier: remap global ids to their stacked-table rows.
            ids_np = self._pos[ids_np].astype(np.int32)
        ids = jnp.asarray(ids_np)
        if self.mode == "table":
            rows, logits = self._serve_jit(self._table, self.params.head, ids)
        else:
            rows, logits = self._serve_jit(
                self.params, self._key, self.graph, ids
            )
        return rows, logits, n

    def memory_stats(self) -> dict:
        """Capacity-planning numbers, same convention as the trainers:
        per-chip table residency, and (sharded tier) the refresh's
        boundary-exchange volume from the partition plan."""
        out = {"mode": self.mode, "buckets": self.buckets}
        if self._table is not None:
            nbytes = (
                self._table.nbytes
                if is_quantized(self._table)
                else int(self._table.size) * self._table.dtype.itemsize
            )
            if self.mesh is not None:
                s = self._table.shape[0]
                out["table_bytes_per_chip"] = nbytes // s
                out["table_bytes_replicated_equiv"] = nbytes
                out["refresh_comm"] = self.partition.comm_stats()
            else:
                out["table_bytes_per_chip"] = nbytes
        return out

    def logits(self, nodes) -> np.ndarray:
        """``[B, C]`` class scores for the requested nodes."""
        _, logits, n = self._logits(nodes)
        return np.asarray(logits)[:n]

    def predict(self, nodes) -> np.ndarray:
        """``[B]`` class predictions (argmax, or multi-hot rows under
        ``model.multilabel``)."""
        _, logits, n = self._logits(nodes)
        return self.model.predictions(logits)[:n]

    def embed(self, nodes) -> np.ndarray:
        """``[B, d_L]`` node representations (the reference's
        ``enc(nodes)`` surface, model.py:31)."""
        rows, _, n = self._logits(nodes)
        return np.asarray(rows, dtype=np.float32)[:n]
