"""Full-graph (non-sampled) training.

Complements the sampled minibatch trainer with transductive full-batch
training: every step runs the deterministic full-neighborhood forward over
all nodes (the reference's ``num_sample=None`` semantics, quirk Q7) and
applies cross-entropy on the train split only. Single-device uses
:meth:`GraphSAGE.forward_full_graph`; on a mesh the same loss runs through
the halo-exchange path (`parallel/halo.py`), which is differentiable — so
full-graph training scales across chips with boundary-only communication.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from graphsage_tpu.data.graph import Graph
from graphsage_tpu.models.graphsage import GraphSAGE, SAGEParams
from graphsage_tpu.train.config import TrainConfig
from graphsage_tpu.train.trainer import TrainState, make_optimizer, reference_splits
from graphsage_tpu.utils.metrics import macro_f1, micro_f1


class FullGraphTrainer:
    """Transductive full-batch trainer (optionally halo-distributed)."""

    def __init__(
        self,
        model: GraphSAGE,
        graph: Graph,
        config: TrainConfig,
        mesh: Optional[Mesh] = None,
        axis: str = "graph",
        partition=None,  # Optional prebuilt NodePartition (avoids the O(E) host precompute twice)
    ):
        self.model = model
        # Host graphs device-place up front: this trainer's logits fns close
        # over adjacency leaves, and closing over host numpy would embed
        # them as compile-time constants (the round-2 constant-folding trap,
        # docs/ROOFLINE.md §re: closure constants).
        if graph.on_host:
            graph = graph.to_device()
        self.graph = graph
        self.cfg = config
        self.mesh = mesh
        self.tx = make_optimizer(config)
        self.test_nodes, self.val_nodes, self.train_nodes = reference_splits(
            graph.num_nodes, config.seed, config.test_size, config.val_size
        )
        train_mask = np.zeros(graph.num_nodes, bool)
        train_mask[self.train_nodes] = True
        self._train_mask = jnp.asarray(train_mask)

        # The feature payload is threaded through jit as an ARGUMENT
        # (self._payload): closing over it would bake a multi-MB HLO
        # constant into the step, and XLA constant-folds the entire
        # first-layer aggregation over constants at compile time — a
        # minutes-long compile at 100K+ nodes.
        if mesh is not None:
            if model.aggregator == "lstm":
                raise ValueError(
                    "FullGraphTrainer's halo mesh path supports mean and "
                    "maxpool only (lstm aggregation is not a per-edge "
                    "segment reduction); use the sampled trainers for lstm"
                )
            from graphsage_tpu.parallel.halo import (
                build_node_partition,
                halo_full_graph_logits,
            )

            # order="auto" sweeps the partition quality levers and builds
            # the minimum-communication plan (falls back to plain input
            # order on structureless graphs — see auto_partition_plan).
            self._part = (
                partition
                if partition is not None
                else build_node_partition(graph, mesh.shape[axis], order="auto")
            )
            self._payload = self._part.h0
            self._logits_fn = lambda p, h0: halo_full_graph_logits(
                model, p, self._part, mesh, axis, h0=h0
            )
        elif (
            model.aggregator == "mean"
            and model.spmm_impl == "bucketed_ell"
            and not graph.symmetric
        ):
            # The bucketed custom backward relies on A == A^T; failing later
            # inside aggregate.spmm_mean with "unknown impl" would mislead.
            raise ValueError(
                "spmm_impl='bucketed_ell' requires symmetric adjacency "
                "(graph.symmetric is False, e.g. built with max_degree "
                "truncation); use spmm_impl='auto' or 'xla'"
            )
        elif (
            model.aggregator == "mean"
            and model.spmm_impl in ("auto", "bucketed_ell")
            and graph.symmetric
        ):
            # Degree-bucketed scatter-free aggregation — the measured winner
            # for full-batch training (Pubmed 3.6 -> 2.1 ms/step, Cora
            # 0.49 -> 0.23; see ops/bucketed_spmm.py), so "auto" picks it.
            from graphsage_tpu.ops.bucketed_spmm import (
                make_spmm_mean_bucketed,
                plan_bucketed_spmm,
            )

            self._part = None
            bucketed = make_spmm_mean_bucketed(plan_bucketed_spmm(graph))
            override = lambda x: (bucketed(x), graph.degrees)
            self._payload = graph.features
            self._logits_fn = lambda p, feats: model.forward_full_graph(
                p, graph.replace(features=feats), spmm_override=override
            )
        else:
            self._part = None
            self._payload = graph.features
            self._logits_fn = lambda p, feats: model.forward_full_graph(
                p, graph.replace(features=feats)
            )

        self._jit_step = jax.jit(self._step)
        self._jit_block = jax.jit(self._block, static_argnums=(1,))
        self._jit_logits = jax.jit(self._logits_fn)

    def _loss(self, params: SAGEParams, payload: jax.Array) -> jax.Array:
        logits = self._logits_fn(params, payload)
        ce = self.model.classification_loss(logits, self.graph.labels)
        w = self._train_mask.astype(ce.dtype)
        return (ce * w).sum() / w.sum()

    def _step(
        self, state: TrainState, payload: jax.Array
    ) -> tuple[TrainState, jax.Array]:
        loss, grads = jax.value_and_grad(self._loss)(state.params, payload)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params=params, opt_state=opt_state, key=state.key,
                       step=state.step + 1),
            loss,
        )

    def _block(
        self, state: TrainState, n: int, payload: jax.Array
    ) -> tuple[TrainState, jax.Array]:
        """``n`` full-batch steps per dispatch (relay costs ~28 ms/call)."""
        return jax.lax.scan(
            lambda st, _: self._step(st, payload), state, None, length=n
        )

    def step(self, state: TrainState) -> tuple[TrainState, jax.Array]:
        """One jitted full-batch training step (public single-step API)."""
        return self._jit_step(state, self._payload)

    def init_state(self) -> TrainState:
        key = jax.random.PRNGKey(self.cfg.seed)
        key, init_key = jax.random.split(key)
        params = self.model.init(init_key)
        return TrainState(params=params, opt_state=self.tx.init(params), key=key,
                          step=jnp.zeros((), jnp.int32))

    def evaluate(self, state: TrainState, nodes: np.ndarray) -> dict[str, float]:
        logits = np.asarray(self._jit_logits(state.params, self._payload))
        preds = self.model.predictions(logits)[np.asarray(nodes)]
        truth = np.asarray(self.graph.labels)[np.asarray(nodes)]
        return {
            "micro_f1": micro_f1(truth, preds),
            "macro_f1": macro_f1(truth, preds, self.graph.num_classes),
        }

    def run(
        self,
        log: Callable[[str], None] | None = print,
        initial_state: Optional[TrainState] = None,
        checkpoint_path: str | None = None,
        checkpoint_every: int = 0,
    ) -> dict[str, Any]:
        if checkpoint_every > 0 and not checkpoint_path:
            raise ValueError(
                "checkpoint_every > 0 needs checkpoint_path — without it "
                "no snapshot would ever be written"
            )
        state = initial_state if initial_state is not None else self.init_state()
        losses, times = [], []
        # Same dispatch policy as Trainer.run: per-step for short runs (the
        # steady mean then excludes the first-step compile), scanned blocks
        # otherwise.
        block = max(1, int(getattr(self.cfg, "steps_per_dispatch", 1)))
        if self.cfg.num_steps < 2 * block:
            block = 1
        done = 0
        while done < self.cfg.num_steps:
            n = min(block, self.cfg.num_steps - done)
            t0 = time.perf_counter()
            if n > 1:
                state, block_losses = self._jit_block(state, n, self._payload)
                block_losses = np.asarray(block_losses)  # completion barrier
            else:
                state, loss = self._jit_step(state, self._payload)
                block_losses = np.asarray([float(loss)])
            times.append((time.perf_counter() - t0) / n)
            for j, loss in enumerate(block_losses):
                losses.append(float(loss))
                if log and self.cfg.log_every and (done + j) % self.cfg.log_every == 0:
                    log(f"{done + j} {float(loss)}")
            prev_done, done = done, done + n
            if (
                checkpoint_path
                and checkpoint_every > 0
                and prev_done // checkpoint_every != done // checkpoint_every
            ):
                from graphsage_tpu.utils.checkpoint import save_checkpoint

                save_checkpoint(checkpoint_path, state)
        val = self.evaluate(state, self.val_nodes)
        steady = times[1:] if len(times) > 1 else times
        result = {
            "losses": losses,
            "val_micro_f1": val["micro_f1"],
            "val_macro_f1": val["macro_f1"],
            "mean_step_time": float(np.mean(steady)),
            "state": state,
        }
        if log:
            log(f"Validation F1: {val['micro_f1']}")
            log(f"Average batch time: {result['mean_step_time']}")
        return result
