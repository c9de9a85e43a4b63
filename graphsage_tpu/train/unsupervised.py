"""Trainers for the unsupervised graph-context objective.

Same machinery as the supervised trainers — scanned-block jitted steps,
checkpointing, resume, the reference's split scheme — with the loss swapped
for :func:`unsupervised_loss` and evaluation swapped for the paper's
protocol: freeze embeddings, fit a linear probe on the train split, report
its F1 on the requested nodes. Labels are touched ONLY by the probe, never by
the training gradient (the reference has no counterpart at all — its model is
supervised-only, reference graphsage/model.py:35-37).

Three tiers:

* :class:`UnsupervisedTrainer` — single chip, replicated table.
* :class:`UnsupervisedShardedTrainer` — the node-sharded feature store
  (parallel/feature_store.py): walks/negatives run replicated on the
  adjacency (which the store keeps), and the `(u, v, n_1..n_Q)` groups are
  embedded through the SAME cross-shard gather exchange as supervised
  training. Groups are laid out seed-major so the batch axis shards on
  whole groups — every shard holds its pairs' u, v, and negatives locally
  and only the masked-mean reduction crosses chips (one psum).
* :class:`UnsupervisedFullyShardedTrainer` — nothing graph-sized
  replicated: the walks themselves distribute (each step is an owner-routed
  ``fanout=1`` sample over the E/S-sharded adjacency), frontiers expand
  with distributed per-hop sampling, features ride the compact gather, and
  the linear probe fits on distributed sampled embeddings.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from graphsage_tpu.data.graph import Graph
from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.models.unsupervised import (
    context_group_scores,
    context_groups,
    linear_probe_predict,
    unsupervised_loss,
)
from graphsage_tpu.ops.walks import negative_cdf
from graphsage_tpu.parallel.feature_store import (
    FullyShardedTrainer as _FullyShardedTrainer,
    ShardedFeatureTrainer as _ShardedFeatureTrainer,
)
from graphsage_tpu.train.config import TrainConfig
from graphsage_tpu.train.trainer import Trainer, TrainState

import optax


class UnsupervisedTrainer(Trainer):
    """Self-supervised training; predictions come from a linear probe."""

    def __init__(self, model: GraphSAGE, graph: Graph, config: TrainConfig):
        _require_linear(model)
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
        """Linear-probe predictions on frozen embeddings.

        The probe is fit on the train split every call (it is a few hundred
        microsecond-scale full-batch iterations, jit-cached). Embeddings
        come from the deterministic full-graph forward by default, or the
        fixed-key SAMPLED forward when ``cfg.eval_fanouts`` is set (same
        contract as the supervised :meth:`Trainer.predict` — required for
        e.g. hub-capped-ELL lstm models where full-graph is unavailable).
        """
        nodes = np.asarray(nodes)
        if self.cfg.eval_fanouts is None:
            emb = self._jit_embed_full(state.params, self.graph)
            # Same unit sphere the loss optimizes on (Algorithm 1 line 7).
            emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)
            train_emb, eval_emb = (
                emb[jnp.asarray(self.train_nodes, jnp.int32)],
                emb[jnp.asarray(nodes, jnp.int32)],
            )
        else:
            if getattr(self, "_jit_probe_emb", None) is None:
                import dataclasses as _dc

                emodel = _dc.replace(
                    self.model, fanouts=tuple(self.cfg.eval_fanouts)
                )
                self._jit_probe_emb = jax.jit(
                    lambda p, key, graph, seeds: emodel.forward(
                        p, graph.features, emodel.sample(key, graph, seeds),
                        return_embeddings=True, graph=graph,
                    )
                )
            all_nodes = np.concatenate([np.asarray(self.train_nodes), nodes])
            emb = self._jit_probe_emb(
                state.params, jax.random.PRNGKey(self.cfg.seed + 7),
                self.graph, jnp.asarray(all_nodes, jnp.int32),
            )
            emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)
            n_train = len(self.train_nodes)
            train_emb, eval_emb = emb[:n_train], emb[n_train:]
        preds = linear_probe_predict(
            train_emb,
            jnp.asarray(np.asarray(self.graph.labels)[self.train_nodes], jnp.int32),
            eval_emb,
            self.graph.num_classes,
        )
        return np.asarray(preds)


def _require_linear(model: GraphSAGE) -> None:
    if model.final_activation != "linear":
        raise ValueError(
            "unsupervised training needs final_activation='linear': "
            "with a ReLU last layer every embedding dot is >= 0, the Q "
            "negative log-sigmoid terms dominate, and the objective "
            "collapses to the all-zero fixed point (loss pinned at "
            "(1+Q)*log 2; test-pinned)"
        )


class UnsupervisedShardedTrainer(_ShardedFeatureTrainer):
    """Unsupervised training through the node-sharded feature store.

    Walks, positives, and negatives are computed replicated on the
    adjacency (which :class:`ShardedFeatureTrainer` keeps device-resident —
    only the feature table is sharded). The ``B*(2+Q)`` group seeds are
    sampled into one frontier exactly like a supervised batch of that size,
    the frontier shards on whole groups (the group size divides every
    shard's slice because ``batch_size % num_shards == 0``), and the
    cross-shard row exchange — dense or compact — is byte-identical
    machinery to supervised training. Per-chip feature memory stays
    ``N/S * F``.
    """

    def __init__(self, model, graph, config, mesh, **kwargs):
        _require_linear(model)
        super().__init__(model, graph, config, mesh, **kwargs)
        self.neg_cdf = jax.device_put(
            negative_cdf(np.asarray(self._graph_nofeat.degrees), config.neg_power),
            self._repl,
        )

    # ------------------------------------------------------------------- step
    def _block_payload(self):
        return (*super()._block_payload(), self.neg_cdf)

    def _train_block(self, state, payload, seeds_all):
        feature_shards, hub, graph, edge_leaves, neg_cdf = payload

        def body(st, seeds):
            st, loss, violated = self._sharded_step(
                st, feature_shards, hub, graph, edge_leaves, seeds, neg_cdf
            )
            return st, (loss, violated)

        state, (losses, violated) = jax.lax.scan(body, state, seeds_all)
        return state, losses, violated

    # step() is inherited: the ShardedFeatureTrainer retry ladder drives
    # _step_impl (dynamic dispatch reaches this class's _sharded_step) with
    # the neg_cdf threaded through _step_call_args.
    def _step_call_args(self, seeds):
        return (self.feature_shards, self.hub_leaves, self._graph_nofeat,
                self.edge_slice_leaves, seeds, self.neg_cdf)

    def _sharded_step(self, state, feature_shards, hub, graph, edge_leaves,
                      seeds, neg_cdf, slack=None):
        from graphsage_tpu.models.graphsage import Frontier
        from graphsage_tpu.parallel.feature_store import (
            _guard_state_update,
            _hub_wrap_gather_fns,
            _lead0,
            make_sharded_gather_fns,
        )
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        model = self.model
        axis = self.axis
        q = self.cfg.num_negatives
        slack = self.capacity_slack if slack is None else slack
        next_key, step_key = jax.random.split(state.key)
        # Replicated walk/negative sampling + frontier build: identical key
        # stream and group layout to the single-chip UnsupervisedTrainer —
        # that is what makes N-shard vs 1-chip parity exact.
        group_seeds, pair_mask, k_sample = context_groups(
            step_key, graph, seeds.astype(jnp.int32), neg_cdf,
            walk_length=self.cfg.walk_length, num_negatives=q,
        )
        frontier = model.sample(k_sample, graph, group_seeds)
        gather_fn, gather_mean_fn = make_sharded_gather_fns(
            axis, mode=self.gather_mode,
            num_shards=self.mesh.shape[axis], slack=slack,
        )

        def shard_step(params, shard, hub_l, edge_local, f_ids, f_masks,
                       mask_local):
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
            # Global masked-mean denominator OUTSIDE the differentiated fn
            # (it carries no parameter gradient). Inside it the per-shard
            # loss is local-numerator / global-count, so — exactly like the
            # supervised step — the global loss and gradient are the psum of
            # the per-shard values. (A psum inside loss_fn would NOT make
            # grads global: psum's transpose is identity, so per-shard grad
            # of a psum'd loss is only the local contribution.)
            den = jnp.maximum(
                jax.lax.psum(jnp.sum(mask_local.astype(jnp.float32)), axis),
                1.0,
            )

            def loss_fn(p):
                z = model.forward(
                    p, shard_l, local, return_embeddings=True,
                    gather_fn=g_fn, gather_mean_fn=gm_fn,
                    layer0_table=(
                        table_fn(p, shard_l) if table_fn is not None else None
                    ),
                )
                per_seed, kept = context_group_scores(z, mask_local, q)
                return jnp.sum(per_seed * kept) / den

            loss, grads = jax.value_and_grad(loss_fn)(params)
            loss = jax.lax.psum(loss, axis)
            grads = jax.tree_util.tree_map(
                lambda t: jax.lax.psum(t, axis), grads
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
          frontier.ids, frontier.masks, pair_mask)

        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, key=next_key,
            step=state.step + 1,
        )
        return _guard_state_update(violated, state, new_state), loss, violated

    # ------------------------------------------------------------------- eval
    def predict(self, state, nodes):
        """Linear-probe predictions (the paper's protocol).

        With ``cfg.eval_fanouts`` set, embeddings come from the fixed-key
        sampled forward THROUGH the node-sharded gather (per-chip feature
        memory stays ``N/S·F`` through eval; compact overflow falls back to
        the dense exchange, same policy as the supervised predict).
        Otherwise: the deterministic full-graph forward on a TRANSIENT
        device copy of the source graph — the same documented trade as the
        supervised sharded trainer's ``eval_fanouts=None`` path (probe
        fitting needs train-split embeddings, which is inherently a
        full-graph pass)."""
        nodes = np.asarray(nodes)
        if self.cfg.eval_fanouts is not None:
            import functools as _ft
            import warnings

            all_nodes = np.concatenate([np.asarray(self.train_nodes), nodes])
            s = self.mesh.shape[self.axis]
            pad = (-len(all_nodes)) % s
            seeds = np.concatenate([all_nodes, np.zeros(pad, all_nodes.dtype)])
            seeds_dev = jax.device_put(jnp.asarray(seeds, jnp.int32), self._repl)
            if getattr(self, "_jit_probe_emb", None) is None:
                self._jit_probe_emb = jax.jit(_ft.partial(
                    self._eval_logits_sharded, return_embeddings=True,
                ))
                self._jit_probe_emb_dense = None
            emb, violated = self._jit_probe_emb(
                state.params, self.feature_shards, self.hub_leaves,
                self._graph_nofeat, self.edge_slice_leaves, seeds_dev,
            )
            if bool(violated):
                warnings.warn(
                    "compact sharded-gather capacity exceeded during probe "
                    "eval; falling back to the dense exchange for this "
                    "batch — increase capacity_slack to stay compact"
                )
                if self._jit_probe_emb_dense is None:
                    self._jit_probe_emb_dense = jax.jit(_ft.partial(
                        self._eval_logits_sharded, mode="dense",
                        return_embeddings=True,
                    ))
                emb, _ = self._jit_probe_emb_dense(
                    state.params, self.feature_shards, self.hub_leaves,
                    self._graph_nofeat, self.edge_slice_leaves, seeds_dev,
                )
            emb = emb[: len(all_nodes)]
            emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)
            n_train = len(self.train_nodes)
            preds = linear_probe_predict(
                emb[:n_train],
                jnp.asarray(
                    np.asarray(self._source_graph.labels)[self.train_nodes],
                    jnp.int32,
                ),
                emb[n_train:],
                self._source_graph.num_classes,
            )
            return np.asarray(preds)
        self._require_full_table("the eval_fanouts=None full-graph probe")
        g = (
            self._source_graph.to_device()
            if self._source_graph.on_host
            else self._source_graph
        )
        emb = self.model.embed_full_graph(state.params, g)
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)
        preds = linear_probe_predict(
            emb[jnp.asarray(self.train_nodes, jnp.int32)],
            jnp.asarray(
                np.asarray(self._source_graph.labels)[self.train_nodes],
                jnp.int32,
            ),
            emb,
            self._source_graph.num_classes,
        )
        return np.asarray(preds)[nodes]


class UnsupervisedFullyShardedTrainer(_FullyShardedTrainer):
    """Unsupervised training with NOTHING graph-sized replicated.

    The third tier: adjacency (E/S edges), feature table (N/S·F), and the
    seed batch all shard over one mesh axis — and the graph-context
    machinery distributes with them:

    * **walks** run distributed: each of the ``walk_length`` steps is one
      :func:`~graphsage_tpu.parallel.feature_store.sharded_random_walk`
      round (``fanout=1`` owner routing over the sharded adjacency — the
      same all_to_all machinery as frontier expansion);
    * the positive pick reuses the replicated path's
      :func:`~graphsage_tpu.ops.walks.pick_positive_step` math, keyed
      per shard;
    * **negatives** draw from the ``[N]`` f32 CDF, which stays replicated —
      it is O(N) like the label vector (4 bytes/node), not graph-sized
      (the feature table is ``4·F`` bytes/node, the adjacency ``8·E/N``);
    * the ``(u, v, n_1..n_Q)`` groups stay local to the shard that owns
      the seed, the frontier expands with distributed per-hop sampling,
      features ride the compact gather, and one psum reduces the masked
      mean.

    Sampling randomness is owner-keyed (exactly like the supervised
    :class:`~graphsage_tpu.parallel.feature_store.FullyShardedTrainer`),
    so losses are not bit-equal to the single-chip trainer; pinned instead:
    the distributed walk equals the replicated walk wherever the step is
    deterministic (out-degree 1), chi-square uniformity of the owner-side
    draw, loss finiteness/decrease, and the memory-residency assertions.
    Eval fits the linear probe on DISTRIBUTED sampled embeddings — no
    replicated fallback, the residency claim holds through ``predict``.
    """

    def __init__(self, model, graph, config, mesh, **kwargs):
        _require_linear(model)
        # Negative draws are degree^0.75-skewed BY DESIGN, so owner request
        # buckets are much more unbalanced than supervised frontiers — the
        # supervised default slack (1.5) overflows on real degree
        # distributions. 4x holds comfortably on power-law graphs.
        kwargs.setdefault("capacity_slack", 4.0)
        super().__init__(model, graph, config, mesh, **kwargs)
        # Degrees come from the SOURCE graph: the resident device graph's
        # adjacency leaves are placeholders (only labels survive).
        self.neg_cdf = jax.device_put(
            negative_cdf(
                np.asarray(self._source_graph.degrees), config.neg_power
            ),
            self._repl,
        )

    # ------------------------------------------------------------------- step
    def _block_payload(self):
        return (*super()._block_payload(), self.neg_cdf)

    def _train_block(self, state, payload, seeds_all):
        feature_shards, hub, adjacency_shards, neg_cdf = payload

        def body(st, seeds):
            st, loss, violated = self._fully_sharded_step(
                st, feature_shards, hub, adjacency_shards, seeds, neg_cdf
            )
            return st, (loss, violated)

        state, (losses, violated) = jax.lax.scan(body, state, seeds_all)
        return state, losses, violated

    # step() is inherited: the retry ladder drives _step_impl (dynamic
    # dispatch reaches this class's _fully_sharded_step) with neg_cdf
    # threaded through _step_call_args.
    def _step_call_args(self, seeds):
        return (self.feature_shards, self.hub_leaves, self.adjacency_shards,
                seeds, self.neg_cdf)

    def _fully_sharded_step(self, state, feature_shards, hub, adj_leaves,
                            seeds, neg_cdf, slack=None):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from graphsage_tpu.models.unsupervised import context_group_scores
        from graphsage_tpu.ops.walks import pick_positive_step, sample_from_cdf
        from graphsage_tpu.parallel.feature_store import (
            _guard_state_update,
            _hub_wrap_gather_fns,
            _lead0,
            make_sharded_gather_fns,
            sharded_random_walk,
            sharded_sample_frontier,
        )

        model = self.model
        axis = self.axis
        adj = self.adjacency
        q = self.cfg.num_negatives
        wl = self.cfg.walk_length
        slack = self.capacity_slack if slack is None else slack
        next_key, step_key = jax.random.split(state.key)
        k_walk, k_pick, k_neg, k_sample = jax.random.split(step_key, 4)
        gather_fn, gather_mean_fn = make_sharded_gather_fns(
            axis, mode="compact",
            num_shards=self.mesh.shape[axis], slack=slack,
        )

        def shard_step(params, shard, hub_l, adj_local, seeds_local, cdf):
            shard_l = _lead0(shard)
            g_fn, gm_fn = _hub_wrap_gather_fns(gather_fn, gather_mean_fn,
                                               hub_l)
            al = tuple(a[0] for a in adj_local)
            me = jax.lax.axis_index(axis)
            seeds_l = seeds_local[0].astype(jnp.int32)
            b = seeds_l.shape[0]
            # Distributed walks: k_walk is shared (sharded_sample_neighbors
            # owner-folds it); pick/negative keys fold per shard so draws
            # decorrelate across the batch slices.
            walks, valid, violated = sharded_random_walk(
                axis, adj, *al[:4], seeds_l, wl, k_walk, slack,
            )
            pos, pair_mask = pick_positive_step(
                jax.random.fold_in(k_pick, me), walks, valid, seeds_l
            )
            negs = sample_from_cdf(jax.random.fold_in(k_neg, me), cdf, (b, q))
            group_seeds = jnp.concatenate(
                [seeds_l[:, None], pos[:, None], negs], axis=1
            ).reshape(-1)
            frontier, viol_f = sharded_sample_frontier(
                axis, model, adj, adj_local, group_seeds, k_sample,
                slack,
            )
            violated = violated | viol_f | self._local_sites_violated(
                frontier, slack=slack,
                hub_lookup=hub_l[0] if hub_l else None,
            )
            table_fn = self._layer0_table_fn_adj(al)
            den = jnp.maximum(
                jax.lax.psum(jnp.sum(pair_mask.astype(jnp.float32)), axis),
                1.0,
            )

            def loss_fn(p):
                z = model.forward(
                    p, shard_l, frontier, return_embeddings=True,
                    gather_fn=g_fn, gather_mean_fn=gm_fn,
                    layer0_table=(
                        table_fn(p, shard_l) if table_fn is not None else None
                    ),
                )
                per_seed, kept = context_group_scores(z, pair_mask, q)
                return jnp.sum(per_seed * kept) / den

            loss, grads = jax.value_and_grad(loss_fn)(params)
            loss = jax.lax.psum(loss, axis)
            grads = jax.tree_util.tree_map(
                lambda t: jax.lax.psum(t, axis), grads
            )
            violated_any = jax.lax.psum(violated.astype(jnp.int32), axis) > 0
            return loss, grads, violated_any

        loss, grads, violated = shard_map(
            shard_step,
            mesh=self.mesh,
            in_specs=(
                P(), P(self.axis), P(), (P(self.axis),) * len(adj_leaves),
                P(self.axis), P(),
            ),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )(state.params, feature_shards, hub, adj_leaves,
          seeds.reshape(self.mesh.shape[self.axis], -1), neg_cdf)

        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, key=next_key,
            step=state.step + 1,
        )
        return _guard_state_update(violated, state, new_state), loss, violated

    # ------------------------------------------------------------------- eval
    def predict(self, state, nodes):
        """Linear-probe predictions from DISTRIBUTED sampled embeddings:
        train-split and requested nodes embed through the same per-hop
        owner routing + compact gather as training (fixed key; the shared
        doubled-slack retry policy on overflow) — adjacency stays E/S and
        features N/S·F per chip through eval, no replicated fallback."""
        nodes = np.asarray(nodes)
        all_nodes = np.concatenate([np.asarray(self.train_nodes), nodes])
        s = self.mesh.shape[self.axis]
        pad = (-len(all_nodes)) % s
        seeds = np.concatenate([all_nodes, np.zeros(pad, all_nodes.dtype)])
        emb = self._eval_with_slack_retries(
            state.params, seeds, return_embeddings=True
        )
        emb = emb[: len(all_nodes)]
        emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)
        n_train = len(self.train_nodes)
        labels = jnp.asarray(
            np.asarray(self.graph.labels)[self.train_nodes], jnp.int32
        )
        preds = linear_probe_predict(
            emb[:n_train], labels, emb[n_train:],
            self._source_graph.num_classes,
        )
        return np.asarray(preds)
