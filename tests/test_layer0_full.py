"""Shared-table layer-0 (``layer0="full"``): parity at covering fanouts,
training end-to-end, and the guard rails. This is the structural escape
from the deepest-hop backward scatter floor (ROOFLINE §5.1) and matches the
reference's own frontier dedup semantics (reference aggregators.py:50-51 —
each unique node's layer-0 activation computed once)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.train.config import TrainConfig
from graphsage_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def graph():
    return power_law_graph(num_nodes=300, num_edges=1200, num_feats=24,
                           num_classes=5, seed=2, homophily=0.8)


@pytest.mark.parametrize(
    "mode", ["plain", "concat_self", "self_loop", "maxpool", "maxpool_self_loop"]
)
def test_layer0_full_matches_sampled_at_covering_fanouts(graph, mode):
    """With fanout >= max degree, sampled layer 0 sees complete
    neighborhoods — so the shared-table forward must agree exactly
    (mean: identical denominators; maxpool: max over the same set)."""
    max_deg = int(np.asarray(graph.degrees).max())
    kw = dict(
        in_dim=graph.num_features, num_classes=graph.num_classes,
        hidden_dims=(8, 8), fanouts=(max_deg, max_deg),
        matmul_precision="highest", gather_impl="take",
    )
    if mode == "concat_self":
        kw["concat_self"] = True
    elif mode == "self_loop":
        kw["self_loop"] = True
    elif mode.startswith("maxpool"):
        kw["aggregator"] = "maxpool"
        kw["pool_dim"] = 12
        if mode == "maxpool_self_loop":
            kw["self_loop"] = True
    sampled = GraphSAGE(**kw)
    full = dataclasses.replace(sampled, layer0="full")
    params = sampled.init(jax.random.PRNGKey(0))
    seeds = jnp.arange(64, dtype=jnp.int32)
    key = jax.random.PRNGKey(5)
    ls = np.asarray(sampled.apply(params, key, graph, seeds))
    lf = np.asarray(full.apply(params, key, graph, seeds))
    np.testing.assert_allclose(lf, ls, rtol=1e-4, atol=1e-5)


def test_layer0_full_frontier_is_one_hop_shorter(graph):
    model = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                      hidden_dims=(8, 8), fanouts=(4, 4), layer0="full")
    fr = model.sample(jax.random.PRNGKey(0), graph, jnp.arange(16, dtype=jnp.int32))
    assert len(fr.ids) == 2  # seeds + one sampled hop (layer-1's input)
    assert fr.ids[1].shape == (16 * 4,)


def test_layer0_full_trains_end_to_end(graph):
    model = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                      hidden_dims=(16, 16), fanouts=(4, 4), layer0="full")
    cfg = TrainConfig(batch_size=64, num_steps=12, learning_rate=0.5,
                      test_size=60, val_size=60, log_every=0,
                      steps_per_dispatch=6)
    res = Trainer(model, graph, cfg).run(log=None)
    assert np.isfinite(res["losses"]).all()
    assert res["losses"][-1] < res["losses"][0]


def test_layer0_full_guards():
    with pytest.raises(ValueError, match="layer0"):
        GraphSAGE(in_dim=8, num_classes=2, hidden_dims=(4,), fanouts=(2,),
                  layer0="bogus")


def test_layer0_full_maxpool_trains_end_to_end(graph):
    model = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                      hidden_dims=(16, 16), fanouts=(4, 4), layer0="full",
                      aggregator="maxpool", pool_dim=16)
    cfg = TrainConfig(batch_size=64, num_steps=12, learning_rate=0.3,
                      test_size=60, val_size=60, log_every=0,
                      steps_per_dispatch=6)
    res = Trainer(model, graph, cfg).run(log=None)
    assert np.isfinite(res["losses"]).all()
    assert res["losses"][-1] < res["losses"][0]


@pytest.mark.parametrize(
    "mode", ["dense", "compact", "maxpool", "halo", "halo_maxpool", "halo_hub"]
)
def test_layer0_full_sharded_trainer_parity(graph, mode):
    """The distributed shared-table layer 0 (per-shard edge slice +
    all_gather of the projected rows, or the boundary-rows-only halo
    exchange) must stay in lockstep with the single-device trainer —
    sampling is replicated, so losses and params match step for step."""
    from graphsage_tpu.parallel.feature_store import ShardedFeatureTrainer
    from graphsage_tpu.parallel.mesh import make_mesh

    kw = dict(
        in_dim=graph.num_features, num_classes=graph.num_classes,
        hidden_dims=(8, 8), fanouts=(4, 4), layer0="full",
        gather_impl="take", matmul_precision="highest",
    )
    gather_mode, tr_kw = mode, {}
    if mode.endswith("maxpool"):
        kw.update(aggregator="maxpool", pool_dim=8, self_loop=True)
        gather_mode = "compact"
    if mode.startswith("halo"):
        gather_mode = "dense" if mode == "halo" else "compact"
        tr_kw["layer0_exchange"] = "halo"
        if mode == "halo_hub":
            gather_mode = "compact"
            tr_kw["layer0_halo_kwargs"] = {
                "sizing": "per_offset", "hub_threshold": 8,
            }
    model = GraphSAGE(**kw)
    cfg = TrainConfig(batch_size=32, num_steps=3, learning_rate=0.5,
                      test_size=60, val_size=60, log_every=0)
    single = Trainer(model, graph, cfg)
    sharded = ShardedFeatureTrainer(
        model, graph, cfg, make_mesh({"data": 8}), gather_mode=gather_mode,
        **tr_kw,
    )
    s1, s2 = single.init_state(), sharded.init_state()
    it1, it2 = single.batches(), sharded.batches()
    for _ in range(cfg.num_steps):
        s1, l1 = single.step(s1, next(it1))
        s2, l2 = sharded.step(s2, next(it2))
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        s1.params, s2.params,
    )


def test_layer0_halo_exchange_moves_fewer_bytes(graph):
    """The halo table build must beat the all_gather on a homophilous
    graph — the reason the lever exists — and the stats must agree with
    the trainer's actual plan."""
    from graphsage_tpu.parallel.feature_store import sharded_comm_stats
    from graphsage_tpu.parallel.halo import build_node_partition

    model = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                      hidden_dims=(8, 8), fanouts=(4, 4), layer0="full")
    part = build_node_partition(graph, 8, bounds="equal_nodes")
    stats = sharded_comm_stats(model, 32, 8, num_nodes=graph.num_nodes,
                               layer0_partition=part)
    assert stats["layer0_halo_bytes_per_chip_step"] < (
        stats["layer0_allgather_bytes_per_chip_step"]
    )


def test_equal_nodes_bounds_guards(graph):
    from graphsage_tpu.parallel.halo import build_node_partition

    with pytest.raises(ValueError, match="equal_nodes"):
        build_node_partition(graph, 8, bounds="equal_nodes", order="lpa")
    with pytest.raises(ValueError, match="bounds"):
        build_node_partition(graph, 8, bounds="bogus")


def test_layer0_halo_rejected_by_fully_sharded(graph):
    from graphsage_tpu.parallel.feature_store import FullyShardedTrainer
    from graphsage_tpu.parallel.mesh import make_mesh

    model = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                      hidden_dims=(8, 8), fanouts=(4, 4), layer0="full")
    cfg = TrainConfig(batch_size=32, num_steps=1, test_size=60, val_size=60)
    with pytest.raises(ValueError, match="halo"):
        FullyShardedTrainer(model, graph, cfg, make_mesh({"data": 8}),
                            layer0_exchange="halo")


def test_layer0_full_fully_sharded_parity(graph):
    """FullyShardedTrainer builds the layer-0 table over its sharded
    adjacency (edge slice derived from the local CSR — no duplicate edge
    copy). At covering fanouts distributed sampling is deterministic, so
    training AND the distributed eval match the single-device trainer."""
    from graphsage_tpu.parallel.feature_store import FullyShardedTrainer
    from graphsage_tpu.parallel.mesh import make_mesh

    max_deg = int(np.asarray(graph.degrees).max())
    model = GraphSAGE(
        in_dim=graph.num_features, num_classes=graph.num_classes,
        hidden_dims=(8, 8), fanouts=(max_deg, max_deg), layer0="full",
        gather_impl="take", matmul_precision="highest",
    )
    cfg = TrainConfig(batch_size=32, num_steps=2, learning_rate=0.5,
                      test_size=60, val_size=60, log_every=0,
                      eval_fanouts=(max_deg, max_deg))
    single = Trainer(model, graph, cfg)
    fully = FullyShardedTrainer(model, graph, cfg, make_mesh({"data": 8}),
                                capacity_slack=8.0)
    s1, s2 = single.init_state(), fully.init_state()
    it1, it2 = single.batches(), fully.batches()
    for _ in range(cfg.num_steps):
        s1, l1 = single.step(s1, next(it1))
        s2, l2 = fully.step(s2, next(it2))
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5, atol=1e-6)
    nodes = np.arange(48)
    np.testing.assert_array_equal(
        single.predict(s1, nodes), fully.predict(s2, nodes)
    )


def test_layer0_full_single_layer_model(graph):
    """L=1: the whole forward is the full-graph layer + head gather."""
    max_deg = int(np.asarray(graph.degrees).max())
    sampled = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                        hidden_dims=(8,), fanouts=(max_deg,),
                        matmul_precision="highest", gather_impl="take")
    full = dataclasses.replace(sampled, layer0="full")
    params = sampled.init(jax.random.PRNGKey(1))
    seeds = jnp.arange(32, dtype=jnp.int32)
    key = jax.random.PRNGKey(9)
    np.testing.assert_allclose(
        np.asarray(full.apply(params, key, graph, seeds)),
        np.asarray(sampled.apply(params, key, graph, seeds)),
        rtol=1e-4, atol=1e-5,
    )
