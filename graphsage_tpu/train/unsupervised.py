"""Trainer for the unsupervised graph-context objective.

Same machinery as the supervised :class:`Trainer` — scanned-block jitted
steps, checkpointing, resume, the reference's split scheme — with the loss
swapped for :func:`unsupervised_loss` and evaluation swapped for the paper's
protocol: freeze embeddings, fit a linear probe on the train split, report
its F1 on the requested nodes. Labels are touched ONLY by the probe, never by
the training gradient (the reference has no counterpart at all — its model is
supervised-only, reference graphsage/model.py:35-37).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from graphsage_tpu.data.graph import Graph
from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.models.unsupervised import linear_probe_predict, unsupervised_loss
from graphsage_tpu.ops.walks import negative_cdf
from graphsage_tpu.train.config import TrainConfig
from graphsage_tpu.train.trainer import Trainer, TrainState

import optax


class UnsupervisedTrainer(Trainer):
    """Self-supervised training; predictions come from a linear probe."""

    def __init__(self, model: GraphSAGE, graph: Graph, config: TrainConfig):
        if model.final_activation != "linear":
            raise ValueError(
                "unsupervised training needs final_activation='linear': "
                "with a ReLU last layer every embedding dot is >= 0, the Q "
                "negative log-sigmoid terms dominate, and the objective "
                "collapses to the all-zero fixed point (loss pinned at "
                "(1+Q)*log 2; test-pinned)"
            )
        super().__init__(model, graph, config)
        # Negative table: one [N] f32 CDF, built host-side once. Threaded
        # through the step as a jit ARGUMENT (via _block_payload) — closing
        # over it would bake a node-count-sized constant into the executable.
        self.neg_cdf = jnp.asarray(
            negative_cdf(np.asarray(self.graph.degrees), config.neg_power)
        )
        self._jit_embed_full = jax.jit(
            lambda params, graph: self.model.embed_full_graph(params, graph)
        )

    # ------------------------------------------------------------------- step
    def _block_payload(self):
        return (self.graph, self.neg_cdf)

    def step(self, state: TrainState, seeds: np.ndarray):
        seeds = jnp.asarray(seeds, dtype=jnp.int32)
        state, loss = self._jit_step(state, self._block_payload(), seeds)
        return state, loss

    def _train_step(self, state: TrainState, payload, seeds: jax.Array):
        graph, neg_cdf = payload
        next_key, step_key = jax.random.split(state.key)

        def loss_fn(params):
            return unsupervised_loss(
                self.model,
                params,
                graph,
                step_key,
                seeds,
                neg_cdf,
                walk_length=self.cfg.walk_length,
                num_negatives=self.cfg.num_negatives,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, key=next_key, step=state.step + 1
        )
        return new_state, loss

    # ------------------------------------------------------------------- eval
    def predict(self, state: TrainState, nodes: np.ndarray) -> np.ndarray:
        """Linear-probe predictions on frozen deterministic embeddings.

        The probe is fit on the train split every call (it is a few hundred
        microsecond-scale full-batch iterations, jit-cached); embeddings come
        from the full-graph forward so eval is deterministic.
        """
        nodes = np.asarray(nodes)
        emb = self._jit_embed_full(state.params, self.graph)
        # Same unit sphere the loss optimizes on (Algorithm 1 line 7).
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)
        preds = linear_probe_predict(
            emb[jnp.asarray(self.train_nodes, jnp.int32)],
            jnp.asarray(np.asarray(self.graph.labels)[self.train_nodes], jnp.int32),
            emb,
            self.graph.num_classes,
        )
        return np.asarray(preds)[nodes]
