"""Numerical parity with the reference semantics (SURVEY.md §4.1).

A from-scratch numpy oracle implements the reference's documented math in its
deterministic ``num_sample=None`` mode (quirk Q7): per layer,
``h_l(v) = relu(W_l @ mean_{u in N(v)} h_{l-1}(u))`` with no self term (the
shipped gcn=True configuration, quirk Q2), then head logits
``(W_c @ h_L)^T`` (reference model.py:30-33). Weights are shared between the
oracle (reference ``[out, in]`` convention) and the JAX model (``[in, out]``),
and per-layer activations plus logits must be allclose.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.models.layers import SAGELayerParams
from graphsage_tpu.models.graphsage import SAGEParams


def _oracle_layer(feats_fn, adj, nodes, w_ref, self_concat=False):
    """One reference-semantics layer on `nodes`; feats_fn maps ids->vectors."""
    outs = []
    for v in nodes:
        neigh = sorted(adj[v])
        if neigh:
            m = np.mean([feats_fn(u) for u in neigh], axis=0)
        else:
            m = np.zeros(w_ref.shape[1] if not self_concat else w_ref.shape[1] // 2)
        combined = np.concatenate([feats_fn(v), m]) if self_concat else m
        outs.append(np.maximum(w_ref @ combined, 0.0))
    return np.stack(outs)


def _adj_from_graph(g):
    neighbors = np.asarray(g.neighbors)
    degrees = np.asarray(g.degrees)
    return {v: set(neighbors[v, : degrees[v]].tolist()) for v in range(g.num_nodes)}


@pytest.mark.parametrize("concat_self", [False, True])
def test_two_layer_full_graph_parity(tiny_graph, concat_self):
    g = tiny_graph
    adj = _adj_from_graph(g)
    feats = np.asarray(g.features, dtype=np.float64)
    F, d1, d2, C = g.num_features, 5, 4, g.num_classes

    rng = np.random.default_rng(0)
    in1 = 2 * F if concat_self else F
    in2 = 2 * d1 if concat_self else d1
    w1_ref = rng.normal(size=(d1, in1)).astype(np.float32)  # reference [out, in]
    w2_ref = rng.normal(size=(d2, in2)).astype(np.float32)
    wc_ref = rng.normal(size=(C, d2)).astype(np.float32)

    # Oracle: layer 1 on all nodes, layer 2 on all nodes, logits.
    h1 = _oracle_layer(lambda u: feats[u], adj, range(g.num_nodes), w1_ref, concat_self)
    h2 = _oracle_layer(lambda u: h1[u], adj, range(g.num_nodes), w2_ref, concat_self)
    logits_oracle = h2 @ wc_ref.T

    model = GraphSAGE(
        in_dim=F, num_classes=C, hidden_dims=(d1, d2), fanouts=(None, None),
        concat_self=concat_self,
    )
    params = SAGEParams(
        layers=(
            SAGELayerParams(weight=jnp.asarray(w1_ref.T)),
            SAGELayerParams(weight=jnp.asarray(w2_ref.T)),
        ),
        head=jnp.asarray(wc_ref.T),
    )

    # Full-graph path must agree in every combine mode.
    logits_full = np.asarray(model.forward_full_graph(params, g))
    np.testing.assert_allclose(logits_full, logits_oracle, rtol=1e-4, atol=1e-4)

    # Sampled path with fanout=None must agree too (same math, frontier form).
    seeds = jnp.arange(g.num_nodes, dtype=jnp.int32)
    frontier = model.sample(jax.random.PRNGKey(0), g, seeds)
    logits_sampled = np.asarray(model.forward(params, g.features, frontier))
    np.testing.assert_allclose(logits_sampled, logits_oracle, rtol=1e-4, atol=1e-4)


def test_sampled_path_matches_full_when_fanout_covers_degrees(tiny_graph):
    """fanout >= max true degree => sampling picks every neighbor, so the
    stochastic path must equal the deterministic one exactly."""
    g = tiny_graph
    model = GraphSAGE(in_dim=g.num_features, num_classes=g.num_classes,
                      hidden_dims=(8, 8), fanouts=(16, 16))
    params = model.init(jax.random.PRNGKey(1))
    seeds = jnp.arange(g.num_nodes, dtype=jnp.int32)
    frontier = model.sample(jax.random.PRNGKey(2), g, seeds)
    got = np.asarray(model.forward(params, g.features, frontier))
    want = np.asarray(model.forward_full_graph(params, g))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_loss_matches_manual_ce(tiny_graph):
    g = tiny_graph
    model = GraphSAGE(in_dim=g.num_features, num_classes=g.num_classes,
                      hidden_dims=(4,), fanouts=(None,))
    params = model.init(jax.random.PRNGKey(0))
    seeds = jnp.arange(g.num_nodes, dtype=jnp.int32)
    frontier = model.sample(jax.random.PRNGKey(0), g, seeds)
    logits = np.asarray(model.forward(params, g.features, frontier))
    labels = np.asarray(g.labels)
    # manual softmax CE
    z = logits - logits.max(axis=1, keepdims=True)
    logp = z - np.log(np.exp(z).sum(axis=1, keepdims=True))
    want = -logp[np.arange(len(labels)), labels].mean()
    got = float(model.loss(params, g.features, frontier, g.labels))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_maxpool_aggregator_forward(tiny_graph):
    g = tiny_graph
    model = GraphSAGE(
        in_dim=g.num_features, num_classes=g.num_classes, hidden_dims=(8, 8),
        fanouts=(4, 4), aggregator="maxpool", concat_self=True, pool_dim=6,
    )
    params = model.init(jax.random.PRNGKey(0))
    logits = model.apply(params, jax.random.PRNGKey(1), g, jnp.arange(6, dtype=jnp.int32))
    assert logits.shape == (6, g.num_classes)
    assert np.isfinite(np.asarray(logits)).all()
