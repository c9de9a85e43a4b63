"""Graph relabeling (locality preprocessing): semantics preserved up to
the row permutation, and id-range ownership becomes structure-aware —
the halo layer-0 plan's boundary volume drops on community-structured
graphs (docs/DISTRIBUTED.md; no reference counterpart — its ids are file
order, model.py:46-49)."""

import jax
import numpy as np
import pytest

from graphsage_tpu.data.graph import relabel_graph
from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.parallel.halo import build_node_partition, locality_relabel


@pytest.fixture(scope="module")
def graph():
    return power_law_graph(num_nodes=400, num_edges=1600, num_feats=24,
                           num_classes=4, seed=11, homophily=0.9)


def test_relabel_preserves_semantics(graph):
    """Deterministic full-graph logits must permute with the ids."""
    rng = np.random.default_rng(0)
    order = rng.permutation(graph.num_nodes)
    new, perm = relabel_graph(graph, order)
    assert np.array_equal(perm[order], np.arange(graph.num_nodes))
    np.testing.assert_array_equal(
        np.asarray(new.labels), np.asarray(graph.labels)[order]
    )
    np.testing.assert_array_equal(
        np.asarray(new.degrees), np.asarray(graph.degrees)[order]
    )
    model = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                      hidden_dims=(8, 8), fanouts=(4, 4),
                      matmul_precision="highest")
    params = model.init(jax.random.PRNGKey(0))
    old_logits = np.asarray(model.forward_full_graph(params, graph))
    new_logits = np.asarray(model.forward_full_graph(params, new))
    np.testing.assert_allclose(new_logits[perm], old_logits,
                               rtol=1e-5, atol=1e-6)


def test_relabel_maxpool_and_selfloop(graph):
    order = np.random.default_rng(3).permutation(graph.num_nodes)
    new, perm = relabel_graph(graph, order)
    model = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                      hidden_dims=(8, 8), fanouts=(4, 4), aggregator="maxpool",
                      pool_dim=8, self_loop=True, matmul_precision="highest")
    params = model.init(jax.random.PRNGKey(2))
    old_logits = np.asarray(model.forward_full_graph(params, graph))
    new_logits = np.asarray(model.forward_full_graph(params, new))
    np.testing.assert_allclose(new_logits[perm], old_logits,
                               rtol=1e-5, atol=1e-6)


def _shuffled_community_graph(blocks=8, size=48, seed=0):
    """Dense intra-block cliques-ish, sparse inter-block ring — then ids
    SHUFFLED, so input-order ranges are worst case but the structure is
    fully recoverable."""
    from graphsage_tpu.data.graph import build_graph

    rng = np.random.default_rng(seed)
    n = blocks * size
    edges = []
    for b in range(blocks):
        lo = b * size
        e = rng.integers(lo, lo + size, size=(size * 6, 2))
        edges.append(e[e[:, 0] != e[:, 1]])
        nxt = ((b + 1) % blocks) * size
        bridge = np.stack([
            rng.integers(lo, lo + size, 4),
            rng.integers(nxt, nxt + size, 4),
        ], axis=1)
        edges.append(bridge)
    edges = np.concatenate(edges)
    feats = rng.normal(size=(n, 16)).astype(np.float32)
    labels = np.repeat(np.arange(blocks) % 4, size)
    g = build_graph(feats, labels, edges, num_classes=4)
    shuffled, _ = relabel_graph(g, rng.permutation(n))
    return shuffled


def test_locality_relabel_recovers_shuffled_communities():
    """Shuffled block structure: auto relabeling must recover most of it
    and shrink the equal-node-bounds plan's boundary exchange (the reason
    the hook exists)."""
    from graphsage_tpu.parallel.halo import partition_comm_rows

    g = _shuffled_community_graph()
    s = 8
    base = partition_comm_rows(g, s, order="input", bounds="equal_nodes")
    relabeled, perm = locality_relabel(g, s, order="auto")
    assert not np.array_equal(perm, np.arange(g.num_nodes))  # it acted
    tuned = partition_comm_rows(relabeled, s, order="input",
                                bounds="equal_nodes")
    assert tuned["rows_exchanged_per_shard"] < (
        0.5 * base["rows_exchanged_per_shard"]
    )
    # The built plan agrees with the evaluator.
    built = build_node_partition(relabeled, s, bounds="equal_nodes")
    assert built.comm_stats()["rows_exchanged_per_shard"] == (
        tuned["rows_exchanged_per_shard"]
    )


def test_locality_relabel_auto_falls_back_on_id_local_graph(graph):
    """The power-law generator assigns edges with id locality
    (preferential attachment), so input order already wins — auto must
    return the graph unchanged, not apply a harmful LPA shuffle."""
    relabeled, perm = locality_relabel(graph, 8, order="auto")
    assert relabeled is graph
    assert np.array_equal(perm, np.arange(graph.num_nodes))


def test_relabel_guards(graph):
    with pytest.raises(ValueError, match="permutation"):
        relabel_graph(graph, np.zeros(graph.num_nodes, np.int64))
    with pytest.raises(ValueError, match="permutation"):
        relabel_graph(graph, np.arange(graph.num_nodes - 1))


def test_relabel_host_graph_stays_host():
    from graphsage_tpu.data.graph import build_graph

    edges = np.array([[0, 1], [1, 2], [2, 3], [3, 4], [4, 5], [5, 0]])
    feats = np.arange(6 * 4, dtype=np.float32).reshape(6, 4)
    labels = np.array([0, 1, 0, 1, 0, 1])
    host = build_graph(feats, labels, edges, num_classes=2, placement="host")
    new, _ = relabel_graph(host, np.array([5, 4, 3, 2, 1, 0]))
    assert new.on_host


def test_relabeled_sharded_training_lockstep(graph):
    """End to end: the sharded trainer on a relabeled graph stays in
    lockstep with the single-device trainer on the SAME relabeled graph
    (ownership arithmetic is untouched by the permutation)."""
    from graphsage_tpu.parallel.feature_store import ShardedFeatureTrainer
    from graphsage_tpu.parallel.mesh import make_mesh
    from graphsage_tpu.train.config import TrainConfig
    from graphsage_tpu.train.trainer import Trainer

    relabeled, _ = locality_relabel(graph, 8, order="lpa")
    model = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                      hidden_dims=(8, 8), fanouts=(4, 4), layer0="full",
                      gather_impl="take", matmul_precision="highest")
    cfg = TrainConfig(batch_size=32, num_steps=2, learning_rate=0.5,
                      test_size=60, val_size=60, log_every=0)
    single = Trainer(model, relabeled, cfg)
    sharded = ShardedFeatureTrainer(
        model, relabeled, cfg, make_mesh({"data": 8}),
        gather_mode="compact", layer0_exchange="halo", capacity_slack=4.0,
    )
    s1, s2 = single.init_state(), sharded.init_state()
    it1, it2 = single.batches(), sharded.batches()
    for _ in range(cfg.num_steps):
        s1, l1 = single.step(s1, next(it1))
        s2, l2 = sharded.step(s2, next(it2))
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5, atol=1e-6)
