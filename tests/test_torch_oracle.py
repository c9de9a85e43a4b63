"""Cross-framework parity: a torch implementation of the documented reference
math (independent of both the reference's code and this framework) must
agree with the JAX model — per-layer activations and the CE loss — when
weights are shared and sampling is disabled (SURVEY.md §4.1).

The torch oracle expresses the deterministic full-neighborhood forward as a
row-normalized adjacency matmul: h_l = relu((D^-1 A) h_{l-1} W_l) in the
pure-neighbor-mean mode (reference shipped config, quirk Q2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from graphsage_tpu.models.graphsage import GraphSAGE, SAGEParams
from graphsage_tpu.models.layers import SAGELayerParams


def _torch_forward(adj_dense, feats, weights, head):
    deg = adj_dense.sum(dim=1, keepdim=True).clamp(min=1.0)
    a_norm = adj_dense / deg
    h = feats
    for w in weights:
        h = torch.relu(a_norm @ h @ w)
    return h @ head


def test_torch_vs_jax_full_graph(tiny_graph):
    g = tiny_graph
    n, f = g.num_nodes, g.num_features
    d1, d2, c = 5, 4, g.num_classes

    torch.manual_seed(0)
    w1 = torch.randn(f, d1)
    w2 = torch.randn(d1, d2)
    head = torch.randn(d2, c)

    # dense adjacency from the padded container
    neighbors = np.asarray(g.neighbors)
    degrees = np.asarray(g.degrees)
    adj = torch.zeros(n, n)
    for v in range(n):
        for u in neighbors[v, : degrees[v]]:
            adj[v, int(u)] = 1.0

    feats_t = torch.tensor(np.asarray(g.features))
    logits_t = _torch_forward(adj, feats_t, [w1, w2], head).detach().numpy()

    model = GraphSAGE(in_dim=f, num_classes=c, hidden_dims=(d1, d2),
                      fanouts=(None, None))
    params = SAGEParams(
        layers=(
            SAGELayerParams(weight=jnp.asarray(w1.numpy())),
            SAGELayerParams(weight=jnp.asarray(w2.numpy())),
        ),
        head=jnp.asarray(head.numpy()),
    )
    logits_j = np.asarray(model.forward_full_graph(params, g))
    np.testing.assert_allclose(logits_j, logits_t, rtol=1e-4, atol=1e-4)

    # CE loss parity (reference model.py:35-37 semantics)
    labels = np.asarray(g.labels)
    loss_t = torch.nn.functional.cross_entropy(
        torch.tensor(logits_t), torch.tensor(labels, dtype=torch.long)
    ).item()
    frontier = model.sample(jax.random.PRNGKey(0), g, jnp.arange(n, dtype=jnp.int32))
    loss_j = float(model.loss(params, g.features, frontier, g.labels))
    np.testing.assert_allclose(loss_j, loss_t, rtol=1e-5)


def test_torch_vs_jax_with_sampling_covering_fanout(tiny_graph):
    """With fanout >= max degree the stochastic path must equal the torch
    deterministic forward too."""
    g = tiny_graph
    torch.manual_seed(1)
    w1 = torch.randn(g.num_features, 6)
    head = torch.randn(6, g.num_classes)

    neighbors = np.asarray(g.neighbors)
    degrees = np.asarray(g.degrees)
    adj = torch.zeros(g.num_nodes, g.num_nodes)
    for v in range(g.num_nodes):
        for u in neighbors[v, : degrees[v]]:
            adj[v, int(u)] = 1.0
    logits_t = _torch_forward(
        adj, torch.tensor(np.asarray(g.features)), [w1], head
    ).detach().numpy()

    model = GraphSAGE(in_dim=g.num_features, num_classes=g.num_classes,
                      hidden_dims=(6,), fanouts=(64,))
    params = SAGEParams(
        layers=(SAGELayerParams(weight=jnp.asarray(w1.numpy())),),
        head=jnp.asarray(head.numpy()),
    )
    logits_j = np.asarray(
        model.apply(params, jax.random.PRNGKey(2), g,
                    jnp.arange(g.num_nodes, dtype=jnp.int32))
    )
    np.testing.assert_allclose(logits_j, logits_t, rtol=1e-4, atol=1e-4)
