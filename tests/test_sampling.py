"""Sampler semantics (SURVEY.md §4.2, quirks Q7/Q8/Q4): without replacement,
exactly min(degree, fanout) valid entries, uniform marginals, zero-degree
fully masked, deterministic full-neighborhood mode."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from graphsage_tpu.ops.sampling import full_neighbors, sample_neighbors


def _sample_np(g, key, nodes, fanout):
    ids, mask = sample_neighbors(
        key, g.neighbors, g.degrees, jnp.asarray(nodes, jnp.int32), fanout
    )
    return np.asarray(ids), np.asarray(mask)


def test_without_replacement_and_count(tiny_graph):
    g = tiny_graph
    nodes = np.arange(g.num_nodes)
    degrees = np.asarray(g.degrees)
    for fanout in (1, 2, 3, 5):
        ids, mask = _sample_np(g, jax.random.PRNGKey(0), nodes, fanout)
        assert ids.shape == (g.num_nodes, fanout)
        for v in range(g.num_nodes):
            valid = ids[v][mask[v]]
            assert len(valid) == min(degrees[v], fanout)
            assert len(set(valid.tolist())) == len(valid)  # no duplicates


def test_sampled_ids_are_real_neighbors(tiny_graph):
    g = tiny_graph
    neighbors = np.asarray(g.neighbors)
    degrees = np.asarray(g.degrees)
    for s in range(5):
        ids, mask = _sample_np(g, jax.random.PRNGKey(s), np.arange(g.num_nodes), 2)
        for v in range(g.num_nodes):
            true_set = set(neighbors[v, : degrees[v]].tolist())
            assert set(ids[v][mask[v]].tolist()) <= true_set


def test_zero_degree_fully_masked(tiny_graph):
    ids, mask = _sample_np(tiny_graph, jax.random.PRNGKey(3), np.array([5]), 4)
    assert not mask.any()


def test_full_neighbors_deterministic(tiny_graph):
    g = tiny_graph
    ids, mask = full_neighbors(g.neighbors, g.degrees, jnp.arange(g.num_nodes))
    degrees = np.asarray(g.degrees)
    mask = np.asarray(mask)
    for v in range(g.num_nodes):
        assert mask[v].sum() == degrees[v]
    # fanout=None routes to the same path
    ids2, mask2 = sample_neighbors(
        jax.random.PRNGKey(0), g.neighbors, g.degrees, jnp.arange(g.num_nodes), None
    )
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))
    np.testing.assert_array_equal(mask, np.asarray(mask2))


def test_fanout_wider_than_max_degree(tiny_graph):
    g = tiny_graph
    fanout = g.max_degree + 5
    ids, mask = _sample_np(g, jax.random.PRNGKey(0), np.arange(g.num_nodes), fanout)
    assert ids.shape[1] == fanout
    degrees = np.asarray(g.degrees)
    for v in range(g.num_nodes):
        assert mask[v].sum() == degrees[v]


def test_uniform_marginals():
    """Chi-square style check: sampling 2 of 8 neighbors many times gives each
    neighbor marginal probability ~= 1/4."""
    from graphsage_tpu.data.graph import build_graph

    edges = np.array([[0, i] for i in range(1, 9)])
    g = build_graph(np.zeros((9, 2), np.float32), np.zeros(9), edges, num_classes=1)
    draws = 4000
    keys = jax.random.split(jax.random.PRNGKey(42), draws)
    nodes = jnp.zeros((1,), jnp.int32)
    sample = jax.jit(
        lambda k: sample_neighbors(k, g.neighbors, g.degrees, nodes, 2)[0]
    )
    counts = np.zeros(9)
    all_ids = np.asarray(jax.vmap(sample)(keys)).reshape(-1)
    for i in all_ids:
        counts[i] += 1
    probs = counts[1:] / draws
    np.testing.assert_allclose(probs, 0.25, atol=0.03)


def test_both_methods_same_semantics(tiny_graph):
    g = tiny_graph
    degrees = np.asarray(g.degrees)
    neighbors = np.asarray(g.neighbors)
    for method in ("floyd", "topk"):
        ids, mask = sample_neighbors(
            jax.random.PRNGKey(11), g.neighbors, g.degrees,
            jnp.arange(g.num_nodes, dtype=jnp.int32), 2, method=method,
        )
        ids, mask = np.asarray(ids), np.asarray(mask)
        for v in range(g.num_nodes):
            valid = ids[v][mask[v]]
            assert len(valid) == min(degrees[v], 2), method
            assert len(set(valid.tolist())) == len(valid), method
            assert set(valid.tolist()) <= set(neighbors[v, : degrees[v]].tolist())


def test_floyd_subset_uniformity():
    """All C(4,2)=6 2-subsets of a degree-4 node must be equally likely."""
    from collections import Counter

    from graphsage_tpu.data.graph import build_graph

    edges = np.array([[0, i] for i in range(1, 5)])
    g = build_graph(np.zeros((5, 2), np.float32), np.zeros(5), edges, num_classes=1)
    draws = 6000
    keys = jax.random.split(jax.random.PRNGKey(3), draws)
    nodes = jnp.zeros((1,), jnp.int32)
    sample = jax.jit(
        lambda k: sample_neighbors(k, g.neighbors, g.degrees, nodes, 2, method="floyd")[0]
    )
    ids = np.asarray(jax.vmap(sample)(keys)).reshape(draws, 2)
    counts = Counter(frozenset(row.tolist()) for row in ids)
    assert len(counts) == 6
    freqs = np.array([counts[s] / draws for s in counts])
    np.testing.assert_allclose(freqs, 1 / 6, atol=0.02)


def test_unknown_method_raises(tiny_graph):
    g = tiny_graph
    with pytest.raises(ValueError):
        sample_neighbors(jax.random.PRNGKey(0), g.neighbors, g.degrees,
                         jnp.arange(2, dtype=jnp.int32), 2, method="reservoir")


def test_multi_dim_nodes(tiny_graph):
    g = tiny_graph
    nodes = jnp.array([[0, 1], [2, 3]], jnp.int32)
    ids, mask = sample_neighbors(jax.random.PRNGKey(0), g.neighbors, g.degrees, nodes, 2)
    assert ids.shape == (2, 2, 2)
    assert mask.shape == (2, 2, 2)


def test_capped_ell_csr_sampling_uniform_over_full_set():
    """Hub rows overflow the ELL cap; CSR sampling must still reach every
    neighbor (including those beyond the cap) uniformly without replacement."""
    import numpy as np
    from graphsage_tpu.data.graph import build_graph
    from graphsage_tpu.ops.sampling import sample_neighbors

    hub_deg = 40
    edges = np.array([[0, i] for i in range(1, hub_deg + 1)])
    feats = np.zeros((hub_deg + 1, 4), np.float32)
    g = build_graph(feats, np.zeros(hub_deg + 1), edges, num_classes=1,
                    ell_width_cap=16)
    assert not g.ell_covers_all
    assert g.neighbors.shape[1] == 16
    assert int(np.asarray(g.degrees)[0]) == hub_deg  # CSR keeps the full row

    k = 8
    counts = np.zeros(hub_deg + 1)
    nodes = jnp.zeros((64,), jnp.int32)  # 64 copies of the hub
    for t in range(30):
        ids, mask = sample_neighbors(
            jax.random.PRNGKey(t), g.neighbors, g.degrees, nodes, k,
            indptr=g.indptr, edge_dst=g.edge_dst, ell_covers_all=False,
        )
        ids, mask = np.asarray(ids), np.asarray(mask)
        assert mask.all()  # deg 40 >= k
        for row in ids:
            assert len(set(row.tolist())) == k  # without replacement
            assert set(row.tolist()) <= set(range(1, hub_deg + 1))
        np.add.at(counts, ids.reshape(-1), 1)
    # Uniform marginals over ALL 40 neighbors, not just the first 16.
    tail = counts[17:]
    assert (tail > 0).all()
    rel = counts[1:] / counts[1:].mean()
    assert rel.min() > 0.7 and rel.max() < 1.3


def test_capped_ell_full_neighbors_raises():
    import numpy as np
    from graphsage_tpu.data.graph import build_graph
    from graphsage_tpu.ops.sampling import sample_neighbors

    edges = np.array([[0, i] for i in range(1, 30)])
    g = build_graph(np.zeros((30, 4), np.float32), np.zeros(30), edges,
                    num_classes=1, ell_width_cap=8)
    with pytest.raises(ValueError):
        sample_neighbors(
            jax.random.PRNGKey(0), g.neighbors, g.degrees,
            jnp.zeros((4,), jnp.int32), None, ell_covers_all=False,
        )


# ------------------------------------------------------------- windowed


def _star_graph(hub_deg, ell_width_cap=16):
    from graphsage_tpu.data.graph import build_graph

    edges = np.array([[0, i] for i in range(1, hub_deg + 1)])
    feats = np.zeros((hub_deg + 1, 4), np.float32)
    return build_graph(feats, np.zeros(hub_deg + 1), edges, num_classes=1,
                       ell_width_cap=ell_width_cap)


def test_windowed_uniform_marginals_across_windows():
    """Windowed sampling: P(window) ∝ |window| then uniform-without-
    replacement within it gives every neighbor the exact k/d marginal
    whenever all windows hold >= k elements — including the partial edge
    windows of a 300-degree hub (300 = 2 full 128-lane windows + a 44-
    element remnant, window boundaries NOT aligned to the row start)."""
    hub_deg, k = 300, 4
    g = _star_graph(hub_deg)
    counts = np.zeros(hub_deg + 1)
    nodes = jnp.zeros((64,), jnp.int32)
    draws = 120
    for t in range(draws):
        ids, mask = sample_neighbors(
            jax.random.PRNGKey(t), g.neighbors, g.degrees, nodes, k,
            method="windowed",
            indptr=g.indptr, edge_dst=g.edge_dst, ell_covers_all=False,
        )
        ids, mask = np.asarray(ids), np.asarray(mask)
        assert mask.all()  # every window of a 300-degree row holds >= 4
        for row in ids:
            assert len(set(row.tolist())) == k  # without replacement
            assert set(row.tolist()) <= set(range(1, hub_deg + 1))
        np.add.at(counts, ids.reshape(-1), 1)
    assert counts[0] == 0
    rel = counts[1:] / counts[1:].mean()
    # 64*120 = 7680 requests x 4 draws; expected count ~102 per neighbor.
    assert rel.min() > 0.6 and rel.max() < 1.4


def test_windowed_mean_estimator_unbiased_with_tiny_edge_window():
    """The masked-MEAN estimator is unbiased for ANY window partition —
    even when an edge window holds FEWER than k elements (drawn count
    min(k, |w|) is the denominator). Degree 130 leaves windows that can
    be as small as 2 elements after the row-start offset."""
    hub_deg, k = 130, 8
    g = _star_graph(hub_deg)
    # Feature of neighbor i is i (scalar); true neighbor mean is known.
    feats = np.zeros((hub_deg + 1, 1), np.float32)
    feats[1:, 0] = np.arange(1, hub_deg + 1)
    true_mean = feats[1:, 0].mean()
    nodes = jnp.zeros((128,), jnp.int32)
    est = []
    for t in range(150):
        ids, mask = sample_neighbors(
            jax.random.PRNGKey(1000 + t), g.neighbors, g.degrees, nodes, k,
            method="windowed",
            indptr=g.indptr, edge_dst=g.edge_dst, ell_covers_all=False,
        )
        ids, mask = np.asarray(ids), np.asarray(mask)
        cnt = mask.sum(axis=1)
        assert (cnt >= 1).all() and (cnt <= k).all()
        vals = feats[ids, 0] * mask
        est.append((vals.sum(axis=1) / cnt).mean())
    est = np.asarray(est)
    se = est.std() / np.sqrt(len(est))
    assert abs(est.mean() - true_mean) < 4 * se + 1e-6, (
        est.mean(), true_mean, se,
    )


def test_windowed_zero_degree_and_shapes():
    # Isolated nodes (3, 4) must come back fully masked with k-wide shapes.
    from graphsage_tpu.data.graph import build_graph

    edges = np.array([[0, 1], [0, 2]])
    g2 = build_graph(np.zeros((5, 4), np.float32), np.zeros(5), edges,
                     num_classes=1, ell_width_cap=2)
    ids, mask = sample_neighbors(
        jax.random.PRNGKey(0), g2.neighbors, g2.degrees,
        jnp.asarray([3, 4], jnp.int32), 3, method="windowed",
        indptr=g2.indptr, edge_dst=g2.edge_dst,
        ell_covers_all=g2.ell_covers_all,
    )
    assert ids.shape == (2, 3) and mask.shape == (2, 3)
    assert not np.asarray(mask).any()  # both isolated -> fully masked


def test_windowed_model_trains():
    """GraphSAGE(sampling='windowed') end to end: loss decreases on the
    homophilous synthetic graph, predictions shaped right."""
    from graphsage_tpu.data.synthetic import power_law_graph
    from graphsage_tpu.models.graphsage import GraphSAGE
    from graphsage_tpu.train.config import TrainConfig
    from graphsage_tpu.train.trainer import Trainer

    g = power_law_graph(num_nodes=400, num_edges=2000, num_feats=16,
                        num_classes=4, seed=3, homophily=0.8)
    model = GraphSAGE(in_dim=16, num_classes=4, hidden_dims=(16, 16),
                      fanouts=(4, 4), sampling="windowed")
    res = Trainer(model, g, TrainConfig(
        batch_size=64, num_steps=40, learning_rate=0.5, log_every=0,
        test_size=60, val_size=40,
    )).run(log=None)
    losses = np.asarray(res["losses"])
    assert np.isfinite(losses).all()
    assert losses[-5:].mean() < losses[:5].mean() * 0.7


def test_windowed_fully_sharded_trains_and_topk_rejected():
    """The distributed owner-side sampler supports windowed (its local CSR
    slice carries global neighbor ids); topk is ELL-only and rejected."""
    from graphsage_tpu.data.synthetic import power_law_graph
    from graphsage_tpu.models.graphsage import GraphSAGE
    from graphsage_tpu.parallel.feature_store import FullyShardedTrainer
    from graphsage_tpu.parallel.mesh import make_mesh
    from graphsage_tpu.train.config import TrainConfig

    g = power_law_graph(num_nodes=200, num_edges=800, num_feats=8,
                        num_classes=2, seed=0, homophily=0.8,
                        placement="host")
    cfg = TrainConfig(batch_size=32, num_steps=1, test_size=40,
                      val_size=40, log_every=0)
    mesh = make_mesh({"data": 8})
    model = GraphSAGE(in_dim=8, num_classes=2, hidden_dims=(16, 16),
                      fanouts=(3, 3), sampling="windowed")
    tr = FullyShardedTrainer(model, g, cfg, mesh, capacity_slack=8.0)
    state, loss = tr.step(tr.init_state(), np.zeros(32, np.int32) + 7)
    assert np.isfinite(float(loss))

    with pytest.raises(ValueError, match="topk"):
        FullyShardedTrainer(
            GraphSAGE(in_dim=8, num_classes=2, hidden_dims=(16, 16),
                      fanouts=(3, 3), sampling="topk"),
            g, cfg, mesh,
        )


@pytest.mark.parametrize("mode", [
    dict(concat_self=True),
    dict(self_loop=True),
    dict(aggregator="maxpool", pool_dim=8, concat_self=True),
    dict(aggregator="lstm", pool_dim=8, concat_self=True),
])
def test_windowed_mode_interactions_train_finite(mode):
    """windowed x {concat_self, self_loop, maxpool, lstm}: the sampler
    only changes WHICH neighbors arrive, so every aggregator/self-mode
    combination must train finitely (column-0 self layout preserved)."""
    from graphsage_tpu.data.synthetic import power_law_graph
    from graphsage_tpu.models.graphsage import GraphSAGE
    from graphsage_tpu.train.config import TrainConfig
    from graphsage_tpu.train.trainer import Trainer

    g = power_law_graph(num_nodes=300, num_edges=1500, num_feats=12,
                        num_classes=3, seed=4, homophily=0.8)
    model = GraphSAGE(in_dim=12, num_classes=3, hidden_dims=(8, 8),
                      fanouts=(3, 3), sampling="windowed", **mode)
    res = Trainer(model, g, TrainConfig(
        batch_size=32, num_steps=6, log_every=0, test_size=60, val_size=40,
        optimizer="adam", learning_rate=0.01,
    )).run(log=None)
    assert np.isfinite(res["losses"]).all()
