"""Training loop: a jit-compiled train step around the sampled forward pass.

The reference trains with a Python loop calling ``loss.backward()`` +
``optim.SGD`` per 256-node batch (reference graphsage/model.py:89-103). Here
the entire step — sample, gather, aggregate, project, loss, gradients, SGD
update — is one traced/compiled XLA program; the Python loop only feeds seed
ids and logs.

Batching modes (TrainConfig.batching):

* ``"epoch"``     — shuffled epochs over the train split (sane default).
* ``"reference"`` — replicates the reference's odd scheme (quirk Q5): each
  batch is the head of the *previous* iteration's shuffle.

Splits replicate the reference exactly: a ``RandomState(seed)`` permutation,
first 1000 test (computed but never evaluated there — quirk Q6), next 500
validation, remainder train (model.py:84-87).
"""

from __future__ import annotations

import dataclasses
import random as _pyrandom
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from graphsage_tpu.data.graph import Graph
from graphsage_tpu.models.graphsage import GraphSAGE, SAGEParams
from graphsage_tpu.train.config import TrainConfig
from graphsage_tpu.utils.metrics import macro_f1, micro_f1


@struct.dataclass
class TrainState:
    params: SAGEParams
    opt_state: Any
    key: jax.Array
    step: jax.Array  # int32 scalar


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    """Optimizer from config; plain SGD lr=0.7 reproduces the reference."""
    if config.optimizer == "sgd":
        return optax.sgd(config.learning_rate)
    if config.optimizer == "momentum":
        return optax.sgd(config.learning_rate, momentum=config.momentum)
    if config.optimizer == "adam":
        return optax.adam(config.learning_rate)
    raise ValueError(f"unknown optimizer {config.optimizer!r}")


def reference_splits(
    num_nodes: int, seed: int = 1, test_size: int = 1000, val_size: int = 500
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(test, val, train) node-id arrays, matching reference model.py:84-87."""
    perm = np.random.RandomState(seed).permutation(num_nodes)
    return (
        perm[:test_size],
        perm[test_size : test_size + val_size],
        perm[test_size + val_size :],
    )


class Trainer:
    """Owns the jitted step + host-side batch feeding for one experiment."""

    def __init__(self, model: GraphSAGE, graph: Graph, config: TrainConfig):
        self.model = model
        if model.layer0 == "cached" and graph.layer0_cache is None:
            # One-time build of the frozen deepest-hop aggregate table
            # (exact — quirk Q12 + mean linearity; see with_cached_layer0).
            # int8 graphs keep an int8 cache — a dense f32 cache would be
            # 4x the table quantize_graph exists to shrink.
            from graphsage_tpu.data.graph import with_cached_layer0
            from graphsage_tpu.ops.quantize import is_quantized

            graph = with_cached_layer0(
                graph, self_loop=model.self_loop,
                quantize=is_quantized(graph.features),
            )
        # Subclasses override _place_graph to control what (if anything) of
        # the graph becomes device-resident; the base trainer wants the
        # whole pytree on device (host graphs are placed once here).
        self.graph = self._place_graph(graph)
        self.cfg = config
        self.tx = make_optimizer(config)
        self.test_nodes, self.val_nodes, self.train_nodes = reference_splits(
            graph.num_nodes, config.seed, config.test_size, config.val_size
        )
        if len(self.train_nodes) == 0:
            raise ValueError(
                f"empty train split: graph has {graph.num_nodes} nodes but "
                f"test_size={config.test_size} + val_size={config.val_size} "
                f"consume them all"
            )
        self._jit_step = jax.jit(self._train_step, donate_argnums=(0,))
        self._jit_block = jax.jit(self._train_block, donate_argnums=(0,))
        self._jit_full_logits = jax.jit(
            lambda params, graph: self.model.forward_full_graph(params, graph)
        )
        self._eval_model: Optional[GraphSAGE] = None
        self._jit_eval_logits = None

    # ------------------------------------------------------------------ place
    def _place_graph(self, graph: Graph) -> Graph:
        """Device layout of the graph for this trainer (single-chip: all of
        it). Sharded trainers override to keep only what they replicate."""
        return graph.to_device() if graph.on_host else graph

    # ------------------------------------------------------------------ state
    def init_state(self) -> TrainState:
        key = jax.random.PRNGKey(self.cfg.seed)
        key, init_key = jax.random.split(key)
        params = self.model.init(init_key)
        return TrainState(
            params=params,
            opt_state=self.tx.init(params),
            key=key,
            step=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------- step
    def _train_step(
        self, state: TrainState, graph: Graph, seeds: jax.Array
    ) -> tuple[TrainState, jax.Array]:
        next_key, sample_key = jax.random.split(state.key)

        def loss_fn(params: SAGEParams) -> jax.Array:
            frontier = self.model.sample(sample_key, graph, seeds)
            labels = jnp.take(graph.labels, seeds, axis=0)
            return self.model.loss(
                params, graph.features, frontier, labels, graph=graph
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=params, opt_state=opt_state, key=next_key, step=state.step + 1
        )
        return new_state, loss

    def step(self, state: TrainState, seeds: np.ndarray) -> tuple[TrainState, float]:
        seeds = jnp.asarray(seeds, dtype=jnp.int32)
        state, loss = self._jit_step(state, self.graph, seeds)
        return state, loss

    def _block_payload(self):
        """Device payload threaded through the scanned block as a jit
        ARGUMENT. Closing over large device arrays instead would embed them
        as compile-time constants — XLA then constant-folds entire layers
        at trace time (minutes-long compiles at 100K+ nodes; see
        docs/ROOFLINE.md on closure constants). Sharded trainers override
        to pass their shard stacks."""
        return self.graph

    def _train_block(
        self, state: TrainState, payload, seeds_all: jax.Array
    ) -> tuple[TrainState, jax.Array, jax.Array]:
        """``steps_per_dispatch`` train steps in one compiled scan — one
        host->device dispatch instead of one per step (~28 ms each under the
        relay). ``payload`` is whatever ``_block_payload`` returns (the
        graph here; shard stacks in the sharded trainers).

        Returns ``(state, losses, violated)`` where ``violated`` is a
        per-step bool: trainers whose step can abort (compact sharded-gather
        capacity overflow) flag the exact step so ``run()`` raises with its
        index instead of silently training on; the base step cannot violate.
        """

        def body(st, seeds):
            st, loss = self._train_step(st, payload, seeds)
            return st, (loss, jnp.zeros((), bool))

        state, (losses, violated) = jax.lax.scan(body, state, seeds_all)
        return state, losses, violated

    # ------------------------------------------------------------------ batches
    def batches(self, start_step: int = 0):
        """Yield seed-id arrays of static ``batch_size`` indefinitely.

        ``start_step`` resumes the stream mid-run (checkpoint restore):
        epoch mode seeds each epoch's shuffle independently from
        ``(seed, epoch)``, so skipping ahead is O(1) — no replay of every
        discarded batch. Reference mode's order is inherently sequential
        (each batch is the head of the previous shuffle, quirk Q5), so it
        replays only the shuffles, never materializing skipped batches.
        """
        cfg = self.cfg
        train = np.asarray(self.train_nodes).copy()
        if cfg.batching == "reference":
            rng = _pyrandom.Random(cfg.seed)
            pool = list(train)
            for _ in range(start_step):
                rng.shuffle(pool)
            while True:
                yield np.asarray(pool[: cfg.batch_size], dtype=np.int32)
                rng.shuffle(pool)
        elif cfg.batching == "epoch":
            bpe = -(-len(train) // cfg.batch_size)  # batches per epoch
            epoch = start_step // bpe
            start_i = (start_step % bpe) * cfg.batch_size
            while True:
                shuffled = train.copy()
                np.random.default_rng((cfg.seed, epoch)).shuffle(shuffled)
                # wrap around so every batch keeps the static size
                padded = np.concatenate([shuffled, shuffled[: cfg.batch_size]])
                for i in range(start_i, len(train), cfg.batch_size):
                    yield padded[i : i + cfg.batch_size].astype(np.int32)
                start_i = 0
                epoch += 1
        else:
            raise ValueError(f"unknown batching mode {self.cfg.batching!r}")

    # -------------------------------------------------------------------- eval
    def predict(self, state: TrainState, nodes: np.ndarray) -> np.ndarray:
        """Class predictions for ``nodes``.

        Default: deterministic full-graph forward (complete neighborhoods —
        the reference's ``num_sample=None`` semantics, Q7). With
        ``eval_fanouts`` set: stochastic sampled forward (the reference
        samples at eval time too — SURVEY §3.3).
        """
        nodes = np.asarray(nodes)
        if self.cfg.eval_fanouts is None:
            logits = self._jit_full_logits(state.params, self.graph)
            return self.model.predictions(logits)[nodes]
        if self._eval_model is None:
            fanouts = self.cfg.eval_fanouts or self.model.fanouts
            self._eval_model = dataclasses.replace(self.model, fanouts=tuple(fanouts))
            self._jit_eval_logits = jax.jit(
                lambda params, key, graph, seeds: self._eval_model.apply(
                    params, key, graph, seeds
                )
            )
        logits = self._jit_eval_logits(
            state.params,
            jax.random.PRNGKey(self.cfg.seed + 7),
            self.graph,
            jnp.asarray(nodes, jnp.int32),
        )
        return self.model.predictions(logits)

    def evaluate(self, state: TrainState, nodes: np.ndarray) -> dict[str, float]:
        nodes = np.asarray(nodes)
        preds = self.predict(state, nodes)
        truth = np.asarray(self.graph.labels)[nodes]
        return {
            "micro_f1": micro_f1(truth, preds),
            "macro_f1": macro_f1(truth, preds, self.graph.num_classes),
        }

    # --------------------------------------------------------------------- run
    def run(
        self,
        log: Callable[[str], None] | None = print,
        initial_state: TrainState | None = None,
        checkpoint_path: str | None = None,
        checkpoint_every: int = 0,
    ) -> dict[str, Any]:
        """Train for ``num_steps`` batches; return losses, timings and val F1.

        ``checkpoint_every`` > 0 writes an atomic snapshot to
        ``checkpoint_path`` whenever that many steps complete — the
        checkpoint-restart half of failure tolerance (SURVEY.md §5.3): a
        killed run resumes from the last periodic snapshot via ``--resume``
        instead of restarting.

        Mirrors the reference driver's observable behavior: per-step loss
        lines, then validation micro-F1 and mean step time
        (reference model.py:100-106). ``initial_state`` resumes from a
        restored checkpoint instead of a fresh init; the batch stream is
        fast-forwarded by ``initial_state.step`` so the resumed run
        continues the data order instead of replaying the head, and
        ``num_steps`` means that many *additional* steps.
        """
        if checkpoint_every > 0 and not checkpoint_path:
            raise ValueError(
                "checkpoint_every > 0 needs checkpoint_path — without it "
                "no snapshot would ever be written"
            )
        cfg = self.cfg
        state = initial_state if initial_state is not None else self.init_state()
        batch_iter = self.batches(
            start_step=int(initial_state.step) if initial_state is not None else 0
        )
        # Short runs keep the legacy per-step loop (its steady-state timing
        # excludes the first-step compile); longer runs scan
        # ``steps_per_dispatch`` steps per device dispatch.
        block = max(1, int(cfg.steps_per_dispatch))
        if cfg.num_steps < 2 * block:
            block = 1

        losses: list[float] = []
        times: list[float] = []  # per-step, one entry per dispatched block
        done = 0
        while done < cfg.num_steps:
            n = min(block, cfg.num_steps - done)
            if n > 1:
                seeds_all = jnp.asarray(
                    np.stack([next(batch_iter) for _ in range(n)]), jnp.int32
                )
                t0 = time.perf_counter()
                state, block_losses, violated = self._jit_block(
                    state, self._block_payload(), seeds_all
                )
                block_losses = np.asarray(block_losses)  # completion barrier
                times.append((time.perf_counter() - t0) / n)
                violated = np.asarray(violated)
                block_losses = [float(l) for l in block_losses]
                if violated.any():
                    # A violated step inside the block was a NO-OP on the
                    # state (the sharded steps where-guard their update), so
                    # nothing was corrupted — redo each skipped batch now
                    # through step()'s doubled-slack retry ladder instead of
                    # killing the run. The redone steps apply after the rest
                    # of the block (order shifts; every batch still trains
                    # on unclipped rows — exactness is per batch, and only
                    # the ladder's exhaustion raises).
                    import warnings

                    idxs = [int(j) for j in np.flatnonzero(violated)]
                    warnings.warn(
                        "sharded request capacity exceeded at step(s) "
                        f"{[done + j for j in idxs]} inside a scanned block "
                        "(left unapplied); redoing each batch with the "
                        "doubled-slack retry ladder — set capacity_slack "
                        "higher to avoid the recompiles"
                    )
                    for j in idxs:
                        state, redo_loss = self.step(
                            state, np.asarray(seeds_all[j])
                        )
                        block_losses[j] = float(redo_loss)
            else:
                t0 = time.perf_counter()
                state, loss = self.step(state, next(batch_iter))
                block_losses = [float(loss)]
                times.append(time.perf_counter() - t0)
            for j, l in enumerate(block_losses):
                losses.append(l)
                if log and cfg.log_every and (done + j) % cfg.log_every == 0:
                    log(f"{done + j} {l}")
            prev_done, done = done, done + n
            if (
                checkpoint_path
                and checkpoint_every > 0
                and prev_done // checkpoint_every != done // checkpoint_every
            ):
                from graphsage_tpu.utils.checkpoint import save_checkpoint

                save_checkpoint(checkpoint_path, state)

        val = self.evaluate(state, self.val_nodes)
        # Skip the compile block when reporting mean time.
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
