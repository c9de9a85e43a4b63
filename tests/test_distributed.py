"""Distributed tests on a simulated 8-device CPU mesh (SURVEY.md §4.5):
mesh/sharding construction, edge-partitioned aggregation parity with the
single-shard path, and N-shard == 1-shard training invariance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.parallel.distributed import (
    ShardedTrainer,
    distributed_full_graph_logits,
    sharded_spmm_mean,
)
from graphsage_tpu.parallel.mesh import default_mesh_shape, make_mesh
from graphsage_tpu.parallel.partition import partition_edges, partition_stats
from graphsage_tpu.train.config import TrainConfig
from graphsage_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def graph():
    return power_law_graph(num_nodes=200, num_edges=800, num_feats=16, num_classes=4, seed=3)


def test_make_mesh_shapes():
    mesh = make_mesh({"data": 4, "model": 2})
    assert mesh.shape == {"data": 4, "model": 2}
    assert default_mesh_shape(8) == {"data": 2, "model": 4}
    assert default_mesh_shape(6) == {"data": 3, "model": 2}
    assert default_mesh_shape(1) == {"data": 1, "model": 1}
    with pytest.raises(ValueError):
        make_mesh({"data": 64})


def test_partition_edges_covers_all(graph):
    part = partition_edges(graph, 8)
    assert part.edge_src.shape[0] == 8
    total_real = int(np.asarray(part.edge_mask).sum())
    assert total_real == graph.num_edges
    stats = partition_stats(graph, 8)
    assert stats["num_shards"] == 8
    assert stats["edges_per_shard_max"] >= stats["edges_per_shard_min"]


def test_sharded_spmm_matches_local(graph):
    from graphsage_tpu.ops.aggregate import spmm_mean

    mesh = make_mesh({"graph": 8})
    part = partition_edges(graph, 8)
    got, cnt = sharded_spmm_mean(mesh, "graph", graph.features, part, graph.num_nodes)
    want = spmm_mean(
        graph.features, graph.edge_src, graph.edge_dst, graph.edge_mask, graph.num_nodes
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(cnt).astype(np.int32), np.asarray(graph.degrees)
    )


def test_distributed_full_graph_matches_single(graph):
    model = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                      hidden_dims=(8, 8), fanouts=(None, None))
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh({"graph": 8})
    got = distributed_full_graph_logits(model, params, graph, mesh)
    want = model.forward_full_graph(params, graph)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_sharded_trainer_matches_single_device(graph):
    """DP+TP over 8 devices must train to the same params as one device
    (identical seeds => identical batches and sample keys)."""
    model = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                      hidden_dims=(8, 8), fanouts=(4, 4))
    cfg = TrainConfig(batch_size=32, num_steps=4, learning_rate=0.5,
                      test_size=40, val_size=40, log_every=0)

    single = Trainer(model, graph, cfg)
    s_state = single.init_state()
    it1 = single.batches()
    losses1 = []
    for _ in range(cfg.num_steps):
        s_state, l = single.step(s_state, next(it1))
        losses1.append(float(l))

    mesh = make_mesh({"data": 4, "model": 2})
    sharded = ShardedTrainer(model, graph, cfg, mesh)
    d_state = sharded.init_state()
    it2 = sharded.batches()
    losses2 = []
    for _ in range(cfg.num_steps):
        d_state, l = sharded.step(d_state, next(it2))
        losses2.append(float(l))

    np.testing.assert_allclose(losses1, losses2, rtol=1e-4)
    p1 = jax.tree_util.tree_leaves(s_state.params)
    p2 = jax.tree_util.tree_leaves(d_state.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_sharded_trainer_rejects_indivisible_batch(graph):
    model = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                      hidden_dims=(8,), fanouts=(4,))
    mesh = make_mesh({"data": 8})
    with pytest.raises(ValueError):
        ShardedTrainer(model, graph, TrainConfig(batch_size=30), mesh, model_axis=None)


def test_distributed_self_loop_matches_single(graph):
    """Review finding: the distributed layer loops dropped self_loop —
    now all paths share apply_full_graph_mean_layer."""
    import dataclasses
    from graphsage_tpu.models.graphsage import GraphSAGE

    model = GraphSAGE(
        in_dim=graph.num_features, num_classes=graph.num_classes,
        hidden_dims=(8, 8), fanouts=(3, 3), self_loop=True,
        matmul_precision="highest", gather_impl="take",
    )
    params = model.init(jax.random.PRNGKey(5))
    mesh = make_mesh({"graph": 8})
    want = model.forward_full_graph(params, graph)
    got = distributed_full_graph_logits(model, params, graph, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_distributed_maxpool_matches_single(graph):
    """Edge-partitioned maxpool (pmax combine + guarded empty rows) == the
    single-device forward — BASELINE config #3 under a graph mesh."""
    from graphsage_tpu.parallel.distributed import distributed_full_graph_logits

    m = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                  hidden_dims=(8, 8), fanouts=(None, None),
                  aggregator="maxpool", pool_dim=8, concat_self=True,
                  matmul_precision="highest")
    params = m.init(jax.random.PRNGKey(5))
    mesh = make_mesh({"graph": 8})
    got = np.asarray(distributed_full_graph_logits(m, params, graph, mesh))
    want = np.asarray(m.forward_full_graph(params, graph))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_param_shardings_layer0_only_when_dims_collide(graph):
    """in_dim == hidden must NOT spread TP to every layer (round-1 review:
    the old shape heuristic sharded all weights when F == hidden)."""
    from jax.sharding import PartitionSpec as P

    from graphsage_tpu.parallel.mesh import param_shardings

    model = GraphSAGE(in_dim=16, num_classes=4, hidden_dims=(16, 16),
                      fanouts=(3, 3))
    params = model.init(jax.random.PRNGKey(0))
    mesh = make_mesh({"data": 2, "model": 4})
    specs = param_shardings(mesh, params, model.in_dim)
    assert specs.layers[0].weight.spec == P("model", None)
    assert specs.layers[1].weight.spec == P()
    assert specs.head.spec == P()


def test_sharded_trainer_tp_parity_when_dims_collide(graph):
    """End-to-end DP+TP with in_dim == hidden still matches single device."""
    model = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                      hidden_dims=(16, 16), fanouts=(4, 4))
    cfg = TrainConfig(batch_size=32, num_steps=3, learning_rate=0.5,
                      test_size=40, val_size=40, log_every=0)
    single = Trainer(model, graph, cfg)
    s_state = single.init_state()
    it1 = single.batches()
    mesh = make_mesh({"data": 2, "model": 4})
    sharded = ShardedTrainer(model, graph, cfg, mesh)
    d_state = sharded.init_state()
    it2 = sharded.batches()
    for _ in range(cfg.num_steps):
        s_state, l1 = single.step(s_state, next(it1))
        d_state, l2 = sharded.step(d_state, next(it2))
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)


def test_sharded_trainer_cached_layer0_parity(graph):
    """DP+TP with layer0='cached': the trainer must re-place the PARENT-
    prepared graph (which carries the auto-built aggregate cache), not the
    raw argument — round-5 regression where the resharding dropped the
    cache and the first step raised. Exact loss parity vs single device."""
    import dataclasses

    model = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                      hidden_dims=(8, 8), fanouts=(4, 4), layer0="cached",
                      matmul_precision="highest", gather_impl="take")
    cfg = TrainConfig(batch_size=32, num_steps=3, learning_rate=0.5,
                      test_size=40, val_size=40, log_every=0,
                      eval_fanouts=(4, 4))
    single = Trainer(model, graph, cfg)
    for mesh_spec in ({"data": 8}, {"data": 2, "model": 4}):
        sharded = ShardedTrainer(model, graph, cfg, make_mesh(mesh_spec))
        assert sharded.graph.layer0_cache is not None
        s1, s2 = single.init_state(), sharded.init_state()
        it1, it2 = single.batches(), sharded.batches()
        for _ in range(cfg.num_steps):
            s1, l1 = single.step(s1, next(it1))
            s2, l2 = sharded.step(s2, next(it2))
            np.testing.assert_allclose(float(l1), float(l2),
                                       rtol=1e-5, atol=1e-6)
