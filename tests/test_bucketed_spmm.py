"""Degree-bucketed scatter-free full-graph aggregation vs the XLA oracle."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphsage_tpu.data.graph import build_graph
from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.ops.aggregate import spmm_mean
from graphsage_tpu.ops.bucketed_spmm import make_spmm_mean_bucketed, plan_bucketed_spmm


@pytest.fixture(scope="module")
def graph():
    # Heavy-tail-ish: include a hub whose degree exceeds the ELL cap.
    g = power_law_graph(num_nodes=140, num_edges=700, num_feats=24,
                        num_classes=4, seed=13)
    return g


def _xla(x, g):
    return spmm_mean(x, g.edge_src, g.edge_dst, g.edge_mask, g.num_nodes)


def test_forward_matches_xla(graph):
    f = make_spmm_mean_bucketed(plan_bucketed_spmm(graph, widths=(4, 16)))
    x = graph.features.astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(f(x)), np.asarray(_xla(x, graph)), rtol=1e-5, atol=1e-6
    )


def test_grad_matches_xla(graph):
    f = make_spmm_mean_bucketed(plan_bucketed_spmm(graph, widths=(4, 16)))
    x = graph.features.astype(jnp.float32)
    g1 = jax.grad(lambda v: (f(v) ** 2).sum())(x)
    g2 = jax.grad(lambda v: (_xla(v, graph) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_zero_degree_and_hub_rows():
    feats = np.random.RandomState(0).rand(40, 8).astype(np.float32)
    edges = np.array([[0, i] for i in range(1, 30)])  # node 0 is a hub; 30..39 isolated
    g = build_graph(feats, np.zeros(40, np.int32), edges, num_classes=2,
                    ell_width_cap=8)
    assert not g.ell_covers_all  # hub overflows the ELL cap
    f = make_spmm_mean_bucketed(plan_bucketed_spmm(g, widths=(4,)))
    out = np.asarray(f(g.features))
    want = np.asarray(_xla(g.features, g))
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[35], 0.0)  # isolated node


def test_full_graph_trainer_bucketed_matches_xla(graph):
    import graphsage_tpu as gt
    from graphsage_tpu.train.full_graph import FullGraphTrainer

    base = gt.GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                        hidden_dims=(8, 8), fanouts=(None, None),
                        matmul_precision="highest", gather_impl="take")
    cfg = gt.TrainConfig(num_steps=4, log_every=0, test_size=30, val_size=30)
    want = FullGraphTrainer(
        dataclasses.replace(base, spmm_impl="xla"), graph, cfg
    ).run(log=None)
    got = FullGraphTrainer(
        dataclasses.replace(base, spmm_impl="bucketed_ell"), graph, cfg
    ).run(log=None)
    np.testing.assert_allclose(got["losses"], want["losses"], rtol=1e-4)


def test_hub_cap_routes_overflow_to_segment_sum(graph):
    """hub_cap below the max degree must move hub rows to the COO group
    without changing results (forward AND the symmetric custom backward)."""
    max_deg = int(np.asarray(graph.degrees).max())
    assert max_deg > 8  # the fixture has real hubs
    plan = plan_bucketed_spmm(graph, widths=(4,), hub_cap=8)
    assert plan.hub_deg is not None
    assert max(plan.widths) <= 8
    assert int(np.asarray(plan.hub_deg).min()) > 8
    f = make_spmm_mean_bucketed(plan)
    x = graph.features.astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(f(x)), np.asarray(_xla(x, graph)), rtol=1e-5, atol=1e-6
    )
    g1 = jax.grad(lambda v: (f(v) ** 2).sum())(x)
    g2 = jax.grad(lambda v: (_xla(v, graph) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_explicit_bucketed_on_asymmetric_graph_raises():
    import graphsage_tpu as gt
    from graphsage_tpu.train.full_graph import FullGraphTrainer

    feats = np.random.RandomState(0).rand(30, 8).astype(np.float32)
    edges = np.array([[0, i] for i in range(1, 25)])
    g = build_graph(feats, np.zeros(30, np.int32), edges, num_classes=2,
                    max_degree=8)  # truncation => asymmetric
    assert not g.symmetric
    model = gt.GraphSAGE(in_dim=8, num_classes=2, hidden_dims=(4,),
                         fanouts=(None,), spmm_impl="bucketed_ell")
    cfg = gt.TrainConfig(num_steps=1, log_every=0, test_size=5, val_size=5)
    with pytest.raises(ValueError, match="symmetric"):
        FullGraphTrainer(model, g, cfg)
