"""GCN-style self-loop aggregation (the reference's intended-but-crashing
``MeanAggregator(gcn=True)`` branch, SURVEY.md Q2): each node joins its own
neighbor set before the mean/max. Pinned against a numpy oracle and against
sampled<->full-graph consistency."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphsage_tpu.data.graph import build_graph
from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.models.graphsage import GraphSAGE


def _graph():
    feats = np.random.RandomState(3).randn(40, 24).astype(np.float32)
    labels = (np.arange(40) % 3).astype(np.int32)
    edges = np.array([[i % 40, (i * 7 + 1) % 40] for i in range(60)])
    g = build_graph(feats, labels, edges, num_classes=3)
    return g


def _model(**kw):
    base = dict(
        in_dim=24, num_classes=3, hidden_dims=(8,), fanouts=(None,),
        self_loop=True, matmul_precision="highest", gather_impl="take",
    )
    base.update(kw)
    return GraphSAGE(**base)


def test_mean_self_loop_matches_numpy_oracle():
    g = _graph()
    model = _model()
    params = model.init(jax.random.PRNGKey(0))
    logits = np.asarray(model.forward_full_graph(params, g))

    feats = np.asarray(g.features)
    nbrs = np.asarray(g.neighbors)
    deg = np.asarray(g.degrees)
    w = np.asarray(params.layers[0].weight)
    head = np.asarray(params.head)
    want = []
    for v in range(g.num_nodes):
        group = list(nbrs[v, : deg[v]]) + [v]
        agg = feats[group].mean(axis=0)
        want.append(np.maximum(agg @ w, 0.0) @ head)
    np.testing.assert_allclose(logits, np.stack(want), rtol=1e-4, atol=1e-5)


def test_sampled_no_fanout_matches_full_graph():
    g = power_law_graph(num_nodes=80, num_edges=200, num_feats=16, num_classes=4, seed=1)
    model = GraphSAGE(
        in_dim=16, num_classes=4, hidden_dims=(8, 8), fanouts=(None, None),
        self_loop=True, matmul_precision="highest", gather_impl="take",
    )
    params = model.init(jax.random.PRNGKey(1))
    full = model.forward_full_graph(params, g)
    seeds = jnp.arange(g.num_nodes, dtype=jnp.int32)
    frontier = model.sample(jax.random.PRNGKey(2), g, seeds)
    sampled = model.forward(params, g.features, frontier)
    np.testing.assert_allclose(
        np.asarray(sampled), np.asarray(full), rtol=1e-4, atol=1e-5
    )


def test_self_loop_with_project_first_matches_direct():
    g = power_law_graph(num_nodes=80, num_edges=200, num_feats=48, num_classes=4, seed=2)
    base = GraphSAGE(
        in_dim=48, num_classes=4, hidden_dims=(8, 8), fanouts=(4, 4),
        self_loop=True, project_first=False,
        matmul_precision="highest", gather_impl="take",
    )
    pf = dataclasses.replace(base, project_first=True)
    params = base.init(jax.random.PRNGKey(3))
    fr = base.sample(jax.random.PRNGKey(4), g, jnp.arange(32, dtype=jnp.int32))
    np.testing.assert_allclose(
        np.asarray(pf.forward(params, g.features, fr)),
        np.asarray(base.forward(params, g.features, fr)),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(pf.forward_full_graph(params, g)),
        np.asarray(base.forward_full_graph(params, g)),
        rtol=1e-4, atol=1e-5,
    )


def test_maxpool_self_loop_sampled_matches_full_graph():
    g = power_law_graph(num_nodes=60, num_edges=150, num_feats=16, num_classes=3, seed=4)
    model = GraphSAGE(
        in_dim=16, num_classes=3, hidden_dims=(8,), fanouts=(None,),
        aggregator="maxpool", pool_dim=12, self_loop=True,
        matmul_precision="highest", gather_impl="take",
    )
    params = model.init(jax.random.PRNGKey(5))
    full = model.forward_full_graph(params, g)
    frontier = model.sample(
        jax.random.PRNGKey(6), g, jnp.arange(g.num_nodes, dtype=jnp.int32)
    )
    sampled = model.forward(params, g.features, frontier)
    np.testing.assert_allclose(
        np.asarray(sampled), np.asarray(full), rtol=1e-4, atol=1e-5
    )


def test_zero_degree_node_aggregates_to_self():
    feats = np.random.RandomState(0).randn(10, 8).astype(np.float32)
    g = build_graph(feats, np.zeros(10, np.int32), np.array([[0, 1]]), num_classes=2)
    model = _model(in_dim=8, hidden_dims=(4,), fanouts=(None,))
    params = model.init(jax.random.PRNGKey(7))
    logits = np.asarray(model.forward_full_graph(params, g))
    w = np.asarray(params.layers[0].weight)
    head = np.asarray(params.head)
    want5 = np.maximum(feats[5] @ w, 0.0) @ head  # isolated node -> mean({v}) = x_v
    np.testing.assert_allclose(logits[5], want5, rtol=1e-4, atol=1e-5)


def test_self_loop_concat_self_mutually_exclusive():
    with pytest.raises(ValueError):
        _model(concat_self=True)
