"""Project-then-aggregate reordering is exact (up to f32 rounding).

For the mean aggregator the masked mean is linear, so
``mean(X[idx]) @ W == mean((X @ W)[idx])`` and likewise for the full-graph
CSR segment-mean. These tests pin the reordered paths (sampled forward,
full-graph forward, gradients) against the direct order on every mode the
model supports (concat_self on/off), including zero-degree nodes (quirk Q4).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.models.graphsage import GraphSAGE


def _graph():
    g = power_law_graph(
        num_nodes=120, num_edges=300, num_feats=96, num_classes=5, seed=3
    )
    return g


def _model(concat_self, project_first):
    return GraphSAGE(
        in_dim=96,
        num_classes=5,
        hidden_dims=(32, 32),
        fanouts=(4, 4),
        concat_self=concat_self,
        project_first=project_first,
        matmul_precision="highest",
        gather_impl="take",
    )


@pytest.mark.parametrize("concat_self", [False, True])
def test_sampled_forward_matches_direct_order(concat_self):
    g = _graph()
    base = _model(concat_self, project_first=False)
    pf = dataclasses.replace(base, project_first=True)
    params = base.init(jax.random.PRNGKey(0))
    seeds = jnp.arange(48, dtype=jnp.int32)
    key = jax.random.PRNGKey(7)
    frontier = base.sample(key, g, seeds)  # identical sampling both ways
    want = base.forward(params, g.features, frontier)
    got = pf.forward(params, g.features, frontier)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("concat_self", [False, True])
def test_full_graph_forward_matches_direct_order(concat_self):
    g = _graph()
    base = _model(concat_self, project_first=False)
    pf = dataclasses.replace(base, project_first=True)
    params = base.init(jax.random.PRNGKey(1))
    want = base.forward_full_graph(params, g)
    got = pf.forward_full_graph(params, g)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gradients_match_direct_order():
    g = _graph()
    base = _model(False, project_first=False)
    pf = dataclasses.replace(base, project_first=True)
    params = base.init(jax.random.PRNGKey(2))
    seeds = jnp.arange(32, dtype=jnp.int32)
    frontier = base.sample(jax.random.PRNGKey(3), g, seeds)
    labels = jnp.asarray(np.asarray(g.labels)[np.arange(32)])

    def loss(m):
        return lambda p: m.loss(p, g.features, frontier, labels)

    lw, gw = jax.value_and_grad(loss(base))(params)
    lg, gg = jax.value_and_grad(loss(pf))(params)
    np.testing.assert_allclose(lg, lw, rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(gg), jax.tree_util.tree_leaves(gw)
    ):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_auto_enables_only_on_shrinking_layers():
    m = _model(False, project_first="auto")
    assert m.use_project_first(0, 96)  # 96 -> 32 shrinks
    assert not m.use_project_first(1, 32)  # 32 -> 32 does not
    assert not dataclasses.replace(m, aggregator="maxpool", pool_dim=16).use_project_first(0, 96)


def test_sampled_auto_is_backward_aware():
    """The sampled layer-0 "auto" decision weighs the FROZEN-feature
    backward (mean-first: free; project-first: slots-row scatter + dW over
    all N rows), not just forward traffic — pinned at the headline bench
    shapes (docs/ROOFLINE.md constants)."""
    cora = GraphSAGE(in_dim=1433, num_classes=7, hidden_dims=(128, 128),
                     fanouts=(10, 10))
    assert cora._sampled_layer0_project_first(2708, 256 * 10 * 10, 1433 * 4)
    pubmed = GraphSAGE(in_dim=500, num_classes=3, hidden_dims=(128, 128),
                       fanouts=(10, 25))
    assert pubmed._sampled_layer0_project_first(19717, 1024 * 250, 500 * 4)
    # Reddit shape: B*k (128K) < N (233K) and f=602 wide -> mean-first wins
    # ~3x end-to-end; auto must flip.
    reddit = GraphSAGE(in_dim=602, num_classes=41, hidden_dims=(128, 128),
                       fanouts=(10, 25), compute_dtype=jnp.bfloat16)
    assert not reddit._sampled_layer0_project_first(232965, 512 * 250, 602 * 2)
    # no width shrink -> never project-first
    flat = GraphSAGE(in_dim=256, num_classes=32, hidden_dims=(256,) * 3,
                     fanouts=(5, 10, 15))
    assert not flat._sampled_layer0_project_first(10 ** 6, 4096 * 750, 512)
    # explicit overrides bypass the cost model entirely
    assert dataclasses.replace(
        reddit, project_first=True
    )._sampled_layer0_project_first(232965, 512 * 250, 1204)
    assert not dataclasses.replace(
        cora, project_first=False
    )._sampled_layer0_project_first(2708, 25600, 5732)


def test_sampled_auto_flip_matches_forced_project_first():
    """End-to-end wiring check: at a shape where auto picks mean-first
    (B*k << N, f > d), forward/loss/grads equal the forced project-first
    model — proving the decision changes only the ORDER, not the math."""
    g = power_law_graph(
        num_nodes=3000, num_edges=6000, num_feats=96, num_classes=5, seed=5
    )
    auto = GraphSAGE(
        in_dim=96, num_classes=5, hidden_dims=(32, 32), fanouts=(4, 4),
        project_first="auto", matmul_precision="highest", gather_impl="take",
    )
    # 16 seeds * 4 * 4 = 256 slots << 3000 nodes -> auto flips to mean-first
    assert not auto._sampled_layer0_project_first(3000, 256, 96 * 4)
    forced = dataclasses.replace(auto, project_first=True)
    params = auto.init(jax.random.PRNGKey(0))
    seeds = jnp.arange(16, dtype=jnp.int32)
    frontier = auto.sample(jax.random.PRNGKey(1), g, seeds)
    labels = jnp.asarray(np.asarray(g.labels)[np.arange(16)])

    np.testing.assert_allclose(
        auto.forward(params, g.features, frontier),
        forced.forward(params, g.features, frontier),
        rtol=1e-4, atol=1e-5,
    )
    la, ga = jax.value_and_grad(
        lambda p: auto.loss(p, g.features, frontier, labels)
    )(params)
    lf, gf = jax.value_and_grad(
        lambda p: forced.loss(p, g.features, frontier, labels)
    )(params)
    np.testing.assert_allclose(la, lf, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_zero_degree_nodes_stay_guarded():
    # A node with no edges must aggregate to zeros in both orders (Q4).
    feats = np.random.RandomState(0).randn(16, 24).astype(np.float32)
    labels = np.zeros(16, np.int32)
    edges = np.array([[i, (i + 1) % 8] for i in range(8)])  # nodes 8..15 isolated
    from graphsage_tpu.data.graph import build_graph

    g = build_graph(feats, labels, edges, num_classes=2)
    base = GraphSAGE(
        in_dim=24, num_classes=2, hidden_dims=(8, 8), fanouts=(3, 3),
        project_first=False, matmul_precision="highest", gather_impl="take",
    )
    pf = dataclasses.replace(base, project_first=True)
    params = base.init(jax.random.PRNGKey(4))
    want = base.forward_full_graph(params, g)
    got = pf.forward_full_graph(params, g)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)
