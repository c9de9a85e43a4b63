"""Multilabel (PPI-family) classification: sigmoid-BCE head, multi-hot
labels, multilabel metrics, disjoint-union inductive protocol.

The reference has no counterpart (single-graph, single-label softmax CE —
reference model.py:35-37, load_cora model.py:39-63); this family covers the
GraphSAGE paper's protein-protein-interaction benchmark shape: many graphs,
one shared labeling rule, multi-hot [N, C] targets, inductive evaluation on
graphs never seen in training.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphsage_tpu.data.graph import build_graph, disjoint_union
from graphsage_tpu.data.synthetic import synthetic_ppi_graphs
from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.train.config import TrainConfig
from graphsage_tpu.train.full_graph import FullGraphTrainer
from graphsage_tpu.train.trainer import Trainer
from graphsage_tpu.utils.metrics import macro_f1, micro_f1


def _ppi(num_graphs=4, num_nodes=400, num_classes=24, seed=0):
    return synthetic_ppi_graphs(
        num_graphs=num_graphs, num_nodes=num_nodes, num_feats=50,
        num_classes=num_classes, seed=seed, placement="host",
    )


def _model(num_classes=24, **kw):
    kw.setdefault("hidden_dims", (64, 64))
    kw.setdefault("fanouts", (10, 10))
    return GraphSAGE(in_dim=50, num_classes=num_classes, multilabel=True,
                     concat_self=True, **kw)


# --------------------------------------------------------------- containers


def test_build_graph_accepts_multihot_labels():
    g = _ppi(num_graphs=1)[0]
    labels = np.asarray(g.labels)
    assert labels.shape == (400, 24)
    assert labels.dtype == np.int8
    assert set(np.unique(labels)) <= {0, 1}
    assert g.num_classes == 24


def test_build_graph_rejects_mismatched_width():
    feats = np.zeros((10, 4), np.float32)
    labels = np.zeros((10, 3), np.int8)
    with pytest.raises(ValueError, match="multi-hot"):
        build_graph(feats, labels, [(0, 1)], num_classes=5)


def test_disjoint_union_offsets_and_payload():
    gs = _ppi(num_graphs=3)
    u = disjoint_union(gs)
    assert u.num_nodes == sum(g.num_nodes for g in gs)
    assert u.num_edges == sum(g.num_edges for g in gs)
    assert u.symmetric  # all inputs symmetric -> union symmetric
    # No edge crosses component boundaries.
    src = np.asarray(u.edge_src)[: u.num_edges]
    dst = np.asarray(u.edge_dst)[: u.num_edges]
    comp = np.repeat(np.arange(3), [g.num_nodes for g in gs])
    assert (comp[src] == comp[dst]).all()
    # Labels and features concatenate in order.
    np.testing.assert_array_equal(
        np.asarray(u.labels)[: gs[0].num_nodes], np.asarray(gs[0].labels)
    )
    off = gs[0].num_nodes
    np.testing.assert_array_equal(
        np.asarray(u.features)[off : off + gs[1].num_nodes],
        np.asarray(gs[1].features),
    )


def test_disjoint_union_rejects_mixed_layouts():
    g_multi = _ppi(num_graphs=1)[0]
    feats = np.zeros((8, 50), np.float32)
    g_single = build_graph(feats, np.zeros(8, np.int64), [(0, 1), (2, 3)],
                           num_classes=24, placement="host")
    with pytest.raises(ValueError, match="label layouts"):
        disjoint_union([g_multi, g_single])


# -------------------------------------------------------------------- loss


def test_multilabel_loss_matches_hand_bce():
    model = _model()
    logits = jnp.asarray(
        np.random.default_rng(0).normal(size=(16, 24)).astype(np.float32)
    )
    labels = jnp.asarray(
        (np.random.default_rng(1).random((16, 24)) < 0.25).astype(np.int8)
    )
    got = model.classification_loss(logits, labels)
    y = np.asarray(labels, np.float64)
    z = np.asarray(logits, np.float64)
    # BCE with logits: max(z,0) - z*y + log(1+exp(-|z|))
    hand = (np.maximum(z, 0) - z * y + np.log1p(np.exp(-np.abs(z)))).mean(
        axis=-1
    )
    np.testing.assert_allclose(np.asarray(got), hand, rtol=1e-5)


def test_multilabel_loss_rejects_1d_labels():
    model = _model()
    with pytest.raises(ValueError, match="multi-hot"):
        model.classification_loss(jnp.zeros((4, 24)), jnp.zeros(4, jnp.int32))


def test_predictions_threshold_and_argmax():
    logits = np.array([[1.0, -1.0, 0.5], [-2.0, 3.0, -0.1]], np.float32)
    multi = _model(num_classes=3, hidden_dims=(8,), fanouts=(2,))
    np.testing.assert_array_equal(
        multi.predictions(logits), [[1, 0, 1], [0, 1, 0]]
    )
    single = GraphSAGE(in_dim=50, num_classes=3, hidden_dims=(8,), fanouts=(2,))
    np.testing.assert_array_equal(single.predictions(logits), [0, 1])


# ----------------------------------------------------------------- metrics


def test_multilabel_micro_f1_hand_case():
    t = np.array([[1, 0, 1], [0, 1, 0]], np.int8)
    p = np.array([[1, 1, 0], [0, 1, 0]], np.int8)
    # TP=2 (0,0),(1,1); FP=1 (0,1); FN=1 (0,2)
    assert micro_f1(t, p) == pytest.approx(2 * 2 / (2 * 2 + 1 + 1))
    # per-class: c0 f1=1, c1 tp=1 fp=1 -> 2/3, c2 fn=1 -> 0
    assert macro_f1(t, p) == pytest.approx((1.0 + 2 / 3 + 0.0) / 3)


# ------------------------------------------------- training + inductive


def test_ppi_inductive_training_beats_trivial_baselines():
    """Train on a disjoint union of 3 graphs, evaluate on a 4th never seen:
    micro-F1 must clearly beat the best trivial predictor (all-ones /
    all-zeros), proving the shared labeling rule transfers inductively."""
    gs = _ppi()
    train_g = disjoint_union(gs[:3]).to_device()
    test_g = gs[3].to_device()
    model = _model()
    cfg = TrainConfig(batch_size=256, num_steps=120, log_every=0,
                      learning_rate=0.01, optimizer="adam",
                      test_size=0, val_size=200)
    tr = Trainer(model, train_g, cfg)
    st = tr.init_state()
    losses = []
    for _, seeds in zip(range(cfg.num_steps), tr.batches()):
        st, loss = tr.step(st, seeds)
        losses.append(float(loss))
    assert losses[-1] < 0.25 * losses[0]

    ev = Trainer(
        model, test_g,
        TrainConfig(batch_size=64, num_steps=1, log_every=0,
                    test_size=0, val_size=64),
    ).evaluate(st, np.arange(test_g.num_nodes))
    truth = np.asarray(test_g.labels)
    trivial = max(
        micro_f1(truth, np.ones_like(truth)),
        micro_f1(truth, np.zeros_like(truth)),
    )
    assert ev["micro_f1"] > trivial + 0.2
    assert ev["micro_f1"] > 0.75


def test_multilabel_full_graph_trainer():
    """FullGraphTrainer (num_sample=None training) handles multi-hot labels
    through the same classification_loss/predictions surface."""
    g = _ppi(num_graphs=1)[0].to_device()
    model = _model(fanouts=(None, None))
    cfg = TrainConfig(num_steps=60, log_every=0, learning_rate=0.01,
                      optimizer="adam", test_size=0, val_size=80)
    tr = FullGraphTrainer(model, g, cfg)
    st = tr.init_state()
    first = None
    for _ in range(cfg.num_steps):
        st, loss = tr.step(st)
        first = float(loss) if first is None else first
    assert float(loss) < 0.3 * first
    ev = tr.evaluate(st, np.arange(g.num_nodes))
    assert ev["micro_f1"] > 0.75


def test_multilabel_sampled_eval_path():
    """eval_fanouts routes the multilabel prediction through the sampled
    forward; the result has multi-hot shape and sane quality."""
    gs = _ppi(num_graphs=2)
    g = gs[0].to_device()
    model = _model()
    cfg = TrainConfig(batch_size=128, num_steps=80, log_every=0,
                      learning_rate=0.01, optimizer="adam",
                      test_size=0, val_size=80, eval_fanouts=(10, 10))
    tr = Trainer(model, g, cfg)
    st = tr.init_state()
    for _, seeds in zip(range(cfg.num_steps), tr.batches()):
        st, _ = tr.step(st, seeds)
    preds = tr.predict(st, np.arange(100))
    assert preds.shape == (100, 24)
    assert micro_f1(np.asarray(g.labels)[:100], preds) > 0.6


def test_multilabel_sharded_feature_trainer():
    """The node-sharded trainer trains a multilabel model on the 8-device
    CPU mesh — 2-D labels shard along the batch axis like 1-D ones."""
    from graphsage_tpu.parallel.feature_store import ShardedFeatureTrainer
    from graphsage_tpu.parallel.mesh import make_mesh

    g = disjoint_union(_ppi(num_graphs=2))  # host graph
    model = _model()
    mesh = make_mesh({"data": 8})
    cfg = TrainConfig(batch_size=256, num_steps=40, log_every=0,
                      learning_rate=0.01, optimizer="adam",
                      test_size=0, val_size=100)
    tr = ShardedFeatureTrainer(model, g, cfg, mesh, gather_mode="compact")
    st = tr.init_state()
    losses = []
    for _, seeds in zip(range(cfg.num_steps), tr.batches()):
        st, loss = tr.step(st, seeds)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0]
