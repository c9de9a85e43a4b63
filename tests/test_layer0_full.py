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


@pytest.mark.parametrize("mode", ["plain", "concat_self", "self_loop"])
def test_layer0_full_matches_sampled_at_covering_fanouts(graph, mode):
    """With fanout >= max degree, sampled layer 0 sees complete
    neighborhoods — so the shared-table forward must agree exactly."""
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
    with pytest.raises(ValueError, match="mean"):
        GraphSAGE(in_dim=8, num_classes=2, hidden_dims=(4, 4), fanouts=(2, 2),
                  aggregator="maxpool", pool_dim=4, concat_self=True,
                  layer0="full")
    with pytest.raises(ValueError, match="layer0"):
        GraphSAGE(in_dim=8, num_classes=2, hidden_dims=(4,), fanouts=(2,),
                  layer0="bogus")


def test_layer0_full_rejected_by_sharded_trainer(graph):
    from graphsage_tpu.parallel.feature_store import ShardedFeatureTrainer
    from graphsage_tpu.parallel.mesh import make_mesh

    model = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                      hidden_dims=(8, 8), fanouts=(4, 4), layer0="full")
    cfg = TrainConfig(batch_size=32, num_steps=1, test_size=60, val_size=60)
    with pytest.raises(ValueError, match="layer0"):
        ShardedFeatureTrainer(model, graph, cfg, make_mesh({"data": 8}))


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
