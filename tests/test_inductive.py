"""Inductive evaluation — the GraphSAGE paper's headline capability.

Parameters are graph-independent (aggregator + projection weights; the
feature table lives in the Graph, not the params — quirk Q12), so a model
trained on one graph evaluates on nodes and edges it NEVER saw: forward
takes (params, graph) and the graph is a runtime argument. The reference
cannot express this — its Encoder closures bind adj_lists/features at
construction (reference encoders.py:10-31, model.py:70-77).

Protocol pinned here: train on the subgraph induced by the first 70% of
nodes; evaluate with the SAME params on the full graph's held-out 30%
(their edges and features were absent from every training step).
"""

import dataclasses

import jax
import numpy as np
import pytest

from graphsage_tpu.data.graph import induced_subgraph
from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.train.config import TrainConfig
from graphsage_tpu.train.trainer import Trainer
from graphsage_tpu.utils.metrics import micro_f1


@pytest.fixture(scope="module")
def setup():
    full = power_law_graph(num_nodes=600, num_edges=2400, num_feats=48,
                           num_classes=5, seed=4, homophily=0.9)
    n_train = 420
    train_graph = induced_subgraph(full, np.arange(n_train))
    model = GraphSAGE(in_dim=48, num_classes=5, hidden_dims=(32, 32),
                      fanouts=(5, 5))
    cfg = TrainConfig(batch_size=64, num_steps=120, learning_rate=0.5,
                      test_size=60, val_size=60, log_every=0)
    trainer = Trainer(model, train_graph, cfg)
    state = trainer.init_state()
    it = trainer.batches()
    for _ in range(cfg.num_steps):
        state, _ = trainer.step(state, next(it))
    return full, train_graph, model, trainer, state, n_train


def test_inductive_unseen_nodes_beat_chance(setup):
    """Same params, full graph, held-out nodes (never sampled, their edges
    absent from training): accuracy must be far above chance and near the
    in-graph level — the inductive claim, not memorization."""
    full, train_graph, model, trainer, state, n_train = setup
    unseen = np.arange(n_train, full.num_nodes)
    logits = model.forward_full_graph(state.params, full)
    preds = np.asarray(np.argmax(np.asarray(logits), axis=-1))
    truth = np.asarray(full.labels)
    f1_unseen = micro_f1(truth[unseen], preds[unseen])
    f1_seen = micro_f1(truth[:n_train], preds[:n_train])
    assert f1_seen > 0.9, f1_seen
    assert f1_unseen > 0.75, (f1_unseen, "chance = 0.2")
    # Sampled (minibatch) inductive inference agrees with the full pass.
    frontier = model.sample(
        jax.random.PRNGKey(0), full,
        np.asarray(unseen, np.int32),
    )
    s_logits = model.forward(state.params, full.features, frontier)
    s_preds = np.asarray(np.argmax(np.asarray(s_logits), axis=-1))
    assert micro_f1(truth[unseen], s_preds) > 0.7


def test_inductive_serving_engine_on_new_graph(setup):
    """ServingEngine stands up on a graph the params never trained on —
    the deploy-to-a-grown-graph loop (new nodes arrive after training)."""
    from graphsage_tpu.serve import ServingEngine

    full, _, model, _, state, n_train = setup
    eng = ServingEngine(model, full, state.params, mode="table",
                        batch_buckets=(256,))
    unseen = np.arange(n_train, full.num_nodes)
    preds = eng.predict(unseen)
    truth = np.asarray(full.labels)[unseen]
    assert micro_f1(truth, preds) > 0.75


def test_unsupervised_embeddings_transfer(setup):
    """Unsupervised variant: embeddings of UNSEEN nodes from a model
    trained with the graph-context loss on the subgraph separate classes
    (probe fit on seen nodes, applied to unseen)."""
    from graphsage_tpu.models.unsupervised import linear_probe_predict
    from graphsage_tpu.train.unsupervised import UnsupervisedTrainer

    full, train_graph, model, _, _, n_train = setup
    umodel = dataclasses.replace(model, final_activation="linear")
    cfg = TrainConfig(batch_size=64, num_steps=150, optimizer="adam",
                      learning_rate=0.01, objective="unsupervised",
                      walk_length=3, num_negatives=8,
                      test_size=60, val_size=60, log_every=0)
    tr = UnsupervisedTrainer(umodel, train_graph, cfg)
    st = tr.init_state()
    it = tr.batches()
    for _ in range(cfg.num_steps):
        st, _ = tr.step(st, next(it))
    import jax.numpy as jnp

    emb = umodel.embed_full_graph(st.params, full)
    emb = emb / (jnp.linalg.norm(emb, axis=-1, keepdims=True) + 1e-8)
    truth = np.asarray(full.labels)
    preds = np.asarray(linear_probe_predict(
        emb[:n_train], jnp.asarray(truth[:n_train], jnp.int32),
        emb[n_train:], 5,
    ))
    assert micro_f1(truth[n_train:], preds) > 0.6, "chance = 0.2"
