"""VMEM-resident CSR SpMM kernel (interpret mode on CPU) vs the XLA oracle."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphsage_tpu.data.graph import build_graph
from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.ops.aggregate import spmm_mean
from graphsage_tpu.ops.pallas_spmm import fits_vmem, spmm_mean_vmem


@pytest.fixture(scope="module")
def graph():
    return power_law_graph(
        num_nodes=150, num_edges=420, num_feats=40, num_classes=4, seed=5
    )


def _xla(feats, g):
    return spmm_mean(feats, g.edge_src, g.edge_dst, g.edge_mask, g.num_nodes)


def test_forward_matches_xla(graph):
    feats = graph.features.astype(jnp.float32)
    got = spmm_mean_vmem(feats, graph.indptr, graph.edge_dst, interpret=True)
    want = _xla(feats, graph)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_grad_matches_xla_symmetric(graph):
    feats = graph.features.astype(jnp.float32)
    g1 = jax.grad(
        lambda x: (spmm_mean_vmem(x, graph.indptr, graph.edge_dst, True, 8, True) ** 2).sum()
    )(feats)
    g2 = jax.grad(lambda x: (_xla(x, graph) ** 2).sum())(feats)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_grad_matches_xla_directed_fallback(graph):
    feats = graph.features.astype(jnp.float32)
    g1 = jax.grad(
        lambda x: (spmm_mean_vmem(x, graph.indptr, graph.edge_dst, False, 8, True) ** 2).sum()
    )(feats)
    g2 = jax.grad(lambda x: (_xla(x, graph) ** 2).sum())(feats)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_zero_degree_rows_are_zero():
    feats = np.random.RandomState(0).rand(24, 16).astype(np.float32)
    g = build_graph(feats, np.zeros(24, np.int32), np.array([[0, 1]]), num_classes=2)
    out = np.asarray(
        spmm_mean_vmem(g.features, g.indptr, g.edge_dst, interpret=True)
    )
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[5], 0.0)


def test_dispatcher_pallas_impl_matches(graph):
    feats = graph.features.astype(jnp.float32)
    got = spmm_mean(
        feats, graph.edge_src, graph.edge_dst, graph.edge_mask, graph.num_nodes,
        indptr=graph.indptr, impl="pallas_vmem",
    )
    want = _xla(feats, graph)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_full_graph_forward_with_pallas_spmm(graph):
    from graphsage_tpu.models.graphsage import GraphSAGE

    base = GraphSAGE(
        in_dim=40, num_classes=4, hidden_dims=(16, 16), fanouts=(3, 3),
        matmul_precision="highest",
    )
    pal = dataclasses.replace(base, spmm_impl="pallas_vmem")
    params = base.init(jax.random.PRNGKey(0))
    want = base.forward_full_graph(params, graph)
    got = pal.forward_full_graph(params, graph)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_fits_vmem_budget():
    assert fits_vmem(19717, 128)
    assert not fits_vmem(1_000_000, 128)


def test_truncated_graph_uses_directed_backward():
    """Review finding: explicit max_degree truncation makes adjacency
    asymmetric; the dispatcher must not use the symmetric fused backward."""
    feats = np.random.RandomState(1).rand(30, 16).astype(np.float32)
    edges = np.array([[0, i] for i in range(1, 20)] + [[5, 6], [7, 8]])
    g = build_graph(feats, np.zeros(30, np.int32), edges, num_classes=2,
                    max_degree=4)
    assert not g.symmetric
    grad_p = jax.grad(
        lambda x: (
            spmm_mean(
                x, g.edge_src, g.edge_dst, g.edge_mask, g.num_nodes,
                indptr=g.indptr, impl="pallas_vmem", symmetric=g.symmetric,
            ) ** 2
        ).sum()
    )(g.features)
    grad_x = jax.grad(
        lambda x: (
            spmm_mean(x, g.edge_src, g.edge_dst, g.edge_mask, g.num_nodes) ** 2
        ).sum()
    )(g.features)
    np.testing.assert_allclose(np.asarray(grad_p), np.asarray(grad_x),
                               rtol=1e-4, atol=1e-5)
