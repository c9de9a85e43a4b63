"""Node-sharded feature store: cross-shard gather exactness, trainer loss
parity vs single-device, memory accounting (VERDICT.md round-1 item 1;
SURVEY.md §2.3 row 3 — the sharded ``nn.Embedding`` lookup, model.py:70-71).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.parallel.feature_store import (
    ShardedFeatureTrainer,
    shard_features,
    sharded_row_gather,
)
from graphsage_tpu.parallel.mesh import make_mesh
from graphsage_tpu.train.config import TrainConfig
from graphsage_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def graph():
    return power_law_graph(
        num_nodes=200, num_edges=800, num_feats=48, num_classes=5, seed=7,
        homophily=0.8,
    )


def test_sharded_row_gather_exact(graph):
    mesh = make_mesh({"data": 8})
    fs = shard_features(graph.features, 8)
    rng = np.random.default_rng(0)
    # 8 shards x 16 requests each, including repeats and cross-shard rows.
    ids = rng.integers(0, graph.num_nodes, size=(8, 16)).astype(np.int32)

    def f(shard, ids_local):
        return sharded_row_gather("data", shard[0], ids_local[0])[None]

    out = shard_map(
        f, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P("data"),
    )(fs.shards, jnp.asarray(ids))
    want = np.asarray(graph.features)[ids.reshape(-1)].reshape(8, 16, -1)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6, atol=1e-6)


def test_sharded_row_gather_grad_is_scatter_add(graph):
    """d/dtable of sum(gather(table, ids) * g) must scatter g into the
    owned rows — the feature/projection cotangent the backward needs."""
    mesh = make_mesh({"data": 8})
    fs = shard_features(graph.features, 8)
    ids = np.arange(8 * 8).reshape(8, 8).astype(np.int32) % graph.num_nodes

    def loss(shards):
        def f(shard, ids_local):
            rows = sharded_row_gather("data", shard[0], ids_local[0])
            return ((rows * rows).sum() / 2)[None]

        per = shard_map(
            f, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P("data"),
        )(shards, jnp.asarray(ids))
        return per.sum()

    g = jax.grad(loss)(fs.shards)
    # Oracle: scatter-add of the gathered rows themselves.
    feats = np.asarray(graph.features)
    want = np.zeros_like(np.asarray(fs.shards))
    rows_per = fs.rows_per_shard
    for v in ids.reshape(-1):
        s, r = divmod(int(v), rows_per)
        want[s, r] += feats[v]
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "mode",
    ["plain", "concat_self", "self_loop", "maxpool"],
)
def test_sharded_trainer_matches_single_device(graph, mode):
    kw = dict(
        in_dim=graph.num_features, num_classes=graph.num_classes,
        hidden_dims=(8, 8), fanouts=(4, 4), gather_impl="take",
        matmul_precision="highest",
    )
    if mode == "concat_self":
        kw["concat_self"] = True
    elif mode == "self_loop":
        kw["self_loop"] = True
    elif mode == "maxpool":
        kw.update(aggregator="maxpool", pool_dim=8, concat_self=True)
    model = GraphSAGE(**kw)
    cfg = TrainConfig(
        batch_size=32, num_steps=4, learning_rate=0.5,
        test_size=40, val_size=40, log_every=0,
    )
    single = Trainer(model, graph, cfg)
    mesh = make_mesh({"data": 8})
    sharded = ShardedFeatureTrainer(model, graph, cfg, mesh)

    s1, s2 = single.init_state(), sharded.init_state()
    it1, it2 = single.batches(), sharded.batches()
    for _ in range(cfg.num_steps):
        s1, l1 = single.step(s1, next(it1))
        s2, l2 = sharded.step(s2, next(it2))
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5, atol=1e-6)
    # Params stay in lockstep too (gradients flowed through the exchange).
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        s1.params, s2.params,
    )


def test_memory_stats(graph):
    fs = shard_features(graph.features, 8)
    stats = fs.memory_stats()
    assert stats["feature_bytes_per_chip"] * 8 < 1.5 * stats["feature_bytes_replicated"]
    assert stats["memory_reduction"] > 6  # ~8x minus padding
    assert stats["rows_per_shard"] % 8 == 0


def test_run_end_to_end_with_block_dispatch(graph):
    model = GraphSAGE(
        in_dim=graph.num_features, num_classes=graph.num_classes,
        hidden_dims=(8, 8), fanouts=(4, 4),
    )
    cfg = TrainConfig(
        batch_size=32, num_steps=8, steps_per_dispatch=4,
        test_size=40, val_size=40, log_every=0,
    )
    mesh = make_mesh({"data": 8})
    tr = ShardedFeatureTrainer(model, graph, cfg, mesh)
    res = tr.run(log=None)
    assert np.isfinite(res["losses"]).all()
    assert len(res["losses"]) == 8
    assert 0.0 <= res["val_micro_f1"] <= 1.0


def test_compact_gather_exact(graph):
    """Request-routing all_to_all gather == local lookup (capacity ample)."""
    from graphsage_tpu.parallel.feature_store import sharded_row_gather_compact

    mesh = make_mesh({"data": 8})
    fs = shard_features(graph.features, 8)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, graph.num_nodes, size=(8, 24)).astype(np.int32)

    def f(shard, ids_local):
        return sharded_row_gather_compact("data", shard[0], ids_local[0], 24)[None]

    out = shard_map(
        f, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P("data"),
    )(fs.shards, jnp.asarray(ids))
    want = np.asarray(graph.features)[ids.reshape(-1)].reshape(8, 24, -1)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("mode", ["plain", "concat_self"])
def test_compact_trainer_matches_single_device(graph, mode):
    kw = dict(
        in_dim=graph.num_features, num_classes=graph.num_classes,
        hidden_dims=(8, 8), fanouts=(4, 4), gather_impl="take",
        matmul_precision="highest",
    )
    if mode == "concat_self":
        kw["concat_self"] = True
    model = GraphSAGE(**kw)
    cfg = TrainConfig(batch_size=32, num_steps=3, learning_rate=0.5,
                      test_size=40, val_size=40, log_every=0)
    single = Trainer(model, graph, cfg)
    mesh = make_mesh({"data": 8})
    # generous slack: the 200-node graph's ids concentrate on few owners
    compact = ShardedFeatureTrainer(model, graph, cfg, mesh,
                                    gather_mode="compact", capacity_slack=8.0)
    s1, s2 = single.init_state(), compact.init_state()
    it1, it2 = single.batches(), compact.batches()
    for _ in range(cfg.num_steps):
        s1, l1 = single.step(s1, next(it1))
        s2, l2 = compact.step(s2, next(it2))
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5, atol=1e-6)


def test_compact_capacity_overflow_exhausts_ladder_and_raises(graph):
    """With slack so small that even the 8x retry ceiling cannot cover the
    requests (capacity pinned at the 8-row floor), step() must warn per
    retry and raise only after the ladder exhausts (round-3 VERDICT item
    4: the raise survives, but only as the last resort)."""
    model = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                      hidden_dims=(8, 8), fanouts=(4, 4))
    cfg = TrainConfig(batch_size=32, num_steps=1, test_size=40, val_size=40,
                      log_every=0)
    mesh = make_mesh({"data": 8})
    tr = ShardedFeatureTrainer(model, graph, cfg, mesh,
                               gather_mode="compact", capacity_slack=0.1)
    state = tr.init_state()
    with pytest.warns(UserWarning, match="redoing the same batch"):
        with pytest.raises(ValueError, match="capacity"):
            tr.step(state, next(tr.batches()))


def _hub_graph():
    """64 nodes over 8 shards (8 rows each) where EVERY hop's valid
    requests land on shard 0's node range [0, 8): seeds >= 8 point at
    {4..7}, which point at {0..3}. Deterministic overflow: the deepest-hop
    site's per-shard count to owner 0 is between 79 and 128 for ANY seed
    mix, so capacity_slack=4.0 (capacity 64) always violates and the
    ladder's 8.0 rung (capacity 128) always passes."""
    from graphsage_tpu.data.graph import build_graph

    edges = []
    for i in range(8, 64):
        edges += [[i, 4 + (i + t) % 4] for t in range(4)]
    for j in range(4, 8):
        edges += [[j, (j + t) % 4] for t in range(4)]
    for j in range(4):
        edges += [[j, (j + 1 + t) % 4] for t in range(3)]  # no self edges
    rng = np.random.default_rng(11)
    return build_graph(
        rng.normal(size=(64, 12)).astype(np.float32),
        np.zeros(64, np.int64), np.asarray(edges), num_classes=2,
        undirected=False, placement="host",
    )


@pytest.mark.parametrize("fully", [False, True])
def test_step_overflow_retries_with_doubled_slack_and_completes(fully):
    """A capacity overflow must NOT kill the run: the violated step is a
    no-op on the state, step() warns and redoes the SAME batch at doubled
    slack (a recompile), and training continues (round-3 VERDICT item 4).
    The fully-sharded variant exercises the sampling-hop capacities too."""
    from graphsage_tpu.parallel.feature_store import FullyShardedTrainer

    g = _hub_graph()
    model = GraphSAGE(in_dim=12, num_classes=2, hidden_dims=(8, 8),
                      fanouts=(4, 4))
    cfg = TrainConfig(batch_size=64, num_steps=1, test_size=8, val_size=8,
                      log_every=0)
    mesh = make_mesh({"data": 8})
    cls = FullyShardedTrainer if fully else ShardedFeatureTrainer
    kw = {} if fully else {"gather_mode": "compact"}
    tr = cls(model, g, cfg, mesh, capacity_slack=4.0, **kw)
    state = tr.init_state()
    head0 = np.asarray(state.params.head).copy()  # before donation
    seeds = np.arange(64, dtype=np.int32)
    with pytest.warns(UserWarning, match="capacity exceeded"):
        state2, loss = tr.step(state, seeds)
    assert np.isfinite(float(loss))
    assert int(state2.step) == 1  # the violated attempt did not count
    # The retried step actually applied an update.
    assert not np.allclose(np.asarray(state2.params.head), head0)
    # The successful slack was cached; a second step reuses it but must
    # still try the configured slack first (same warning again).
    with pytest.warns(UserWarning, match="capacity exceeded"):
        state3, loss3 = tr.step(state2, seeds)
    assert int(state3.step) == 2


def test_run_mid_block_overflow_redoes_and_completes():
    """Mid-block overflow inside the scanned dispatch: the violated steps
    are left unapplied by the scan, then redone through the retry ladder —
    run() completes instead of raising (round-3 VERDICT item 4's 'the
    run-killing behavior gone')."""
    g = _hub_graph()
    model = GraphSAGE(in_dim=12, num_classes=2, hidden_dims=(8, 8),
                      fanouts=(4, 4))
    cfg = TrainConfig(batch_size=64, num_steps=4, steps_per_dispatch=2,
                      test_size=8, val_size=8, log_every=0)
    mesh = make_mesh({"data": 8})
    tr = ShardedFeatureTrainer(model, g, cfg, mesh,
                               gather_mode="compact", capacity_slack=4.0)
    with pytest.warns(UserWarning, match="redoing each batch"):
        res = tr.run(log=None)
    assert len(res["losses"]) == 4
    assert np.isfinite(res["losses"]).all()


def test_sharded_sampled_eval_matches_single_device(graph):
    """eval_fanouts => predictions come from the node-sharded sampled
    forward (fixed eval key), equal to the single-device trainer's."""
    model = GraphSAGE(
        in_dim=graph.num_features, num_classes=graph.num_classes,
        hidden_dims=(8, 8), fanouts=(4, 4), gather_impl="take",
        matmul_precision="highest",
    )
    cfg = TrainConfig(batch_size=32, num_steps=2, test_size=40, val_size=40,
                      log_every=0, eval_fanouts=(4, 4))
    mesh = make_mesh({"data": 8})
    single = Trainer(model, graph, cfg)
    sharded = ShardedFeatureTrainer(model, graph, cfg, mesh)
    s1, s2 = single.init_state(), sharded.init_state()
    p1 = single.predict(s1, single.val_nodes)
    p2 = sharded.predict(s2, sharded.val_nodes)
    np.testing.assert_array_equal(p1, p2)


def test_fully_sharded_trainer_deterministic_parity(graph):
    """With fanout >= max degree, sampling is deterministic (identity
    slots), so the FULLY sharded trainer (adjacency + features + batch all
    sharded, distributed per-hop sampling) must match the single-device
    trainer loss-for-loss and param-for-param."""
    from graphsage_tpu.parallel.feature_store import FullyShardedTrainer

    max_deg = int(np.asarray(graph.degrees).max())
    model = GraphSAGE(
        in_dim=graph.num_features, num_classes=graph.num_classes,
        hidden_dims=(8, 8), fanouts=(max_deg, max_deg), gather_impl="take",
        matmul_precision="highest",
    )
    cfg = TrainConfig(batch_size=32, num_steps=3, learning_rate=0.5,
                      test_size=40, val_size=40, log_every=0)
    single = Trainer(model, graph, cfg)
    mesh = make_mesh({"data": 8})
    full = FullyShardedTrainer(model, graph, cfg, mesh, capacity_slack=8.0)
    stats = full.memory_stats()
    assert stats["adjacency_bytes_per_chip"] > 0
    s1, s2 = single.init_state(), full.init_state()
    it1, it2 = single.batches(), full.batches()
    for _ in range(cfg.num_steps):
        s1, l1 = single.step(s1, next(it1))
        s2, l2 = full.step(s2, next(it2))
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        s1.params, s2.params,
    )


def test_fully_sharded_trainer_stochastic_trains(graph):
    """Real (sub-degree) fanouts: owner-keyed sampling differs from the
    single-device stream, but the step must produce finite losses that
    decrease, with valid masks throughout."""
    from graphsage_tpu.parallel.feature_store import FullyShardedTrainer

    model = GraphSAGE(
        in_dim=graph.num_features, num_classes=graph.num_classes,
        hidden_dims=(8, 8), fanouts=(3, 3),
    )
    cfg = TrainConfig(batch_size=32, num_steps=10, learning_rate=0.5,
                      test_size=40, val_size=40, log_every=0,
                      steps_per_dispatch=5)
    mesh = make_mesh({"data": 8})
    full = FullyShardedTrainer(model, graph, cfg, mesh, capacity_slack=8.0)
    res = full.run(log=None)
    assert np.isfinite(res["losses"]).all()
    assert res["losses"][-1] < res["losses"][0]


def test_fully_sharded_distributed_eval_parity(graph):
    """predict() routes through the DISTRIBUTED sampler + compact gather
    (round-2 VERDICT item 2); at covering fanouts distributed sampling is
    deterministic, so predictions must equal the replicated trainer's
    sampled eval bit-for-bit."""
    from graphsage_tpu.parallel.feature_store import FullyShardedTrainer

    max_deg = int(np.asarray(graph.degrees).max())
    model = GraphSAGE(
        in_dim=graph.num_features, num_classes=graph.num_classes,
        hidden_dims=(8, 8), fanouts=(max_deg, max_deg), gather_impl="take",
        matmul_precision="highest",
    )
    cfg = TrainConfig(batch_size=32, num_steps=1, test_size=40, val_size=40,
                      log_every=0, eval_fanouts=(max_deg, max_deg))
    single = Trainer(model, graph, cfg)
    mesh = make_mesh({"data": 8})
    full = FullyShardedTrainer(model, graph, cfg, mesh, capacity_slack=8.0)
    s1, s2 = single.init_state(), full.init_state()
    p1 = single.predict(s1, single.val_nodes)
    p2 = full.predict(s2, full.val_nodes)
    np.testing.assert_array_equal(p1, p2)


def test_block_overflow_exhausted_ladder_still_raises_in_run(graph):
    """Mid-block overflow that even the 8x slack ceiling cannot cover
    (capacity pinned at the 8-row floor): run() warns with the violated
    step indices, redoes through the ladder, and the EXHAUSTED ladder's
    raise still surfaces — never a silent clip (round-3 VERDICT item 4)."""
    model = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                      hidden_dims=(8, 8), fanouts=(4, 4))
    cfg = TrainConfig(batch_size=32, num_steps=4, steps_per_dispatch=2,
                      test_size=40, val_size=40, log_every=0)
    mesh = make_mesh({"data": 8})
    tr = ShardedFeatureTrainer(model, graph, cfg, mesh,
                               gather_mode="compact", capacity_slack=0.1)
    with pytest.warns(UserWarning, match="redoing each batch"):
        with pytest.raises(ValueError, match="capacity"):
            tr.run(log=None)


def test_sharded_sampler_uniform_marginals():
    """Chi-square uniformity of the DISTRIBUTED owner-keyed sampler
    (round-2 VERDICT item 5): every shard requests two star centers owned
    by different shards; each sampled neighbor's marginal must be
    fanout/degree. A biased fold_in key-split would skew exactly this."""
    from graphsage_tpu.data.graph import build_graph
    from graphsage_tpu.parallel.feature_store import (
        shard_adjacency,
        sharded_sample_neighbors,
    )

    # 16 nodes over 8 shards (2 rows each). Node 0 (shard 0) and node 15
    # (shard 7) are star centers with neighbors 1..8 each.
    edges = np.concatenate(
        [[[0, i] for i in range(1, 9)], [[15, i] for i in range(1, 9)]]
    )
    g = build_graph(np.zeros((16, 4), np.float32), np.zeros(16), edges,
                    num_classes=1, placement="host")
    mesh = make_mesh({"data": 8})
    adj = shard_adjacency(g, 8)
    fanout, cap = 2, 24

    def hop(ell, deg, indptr, edge_dst, key):
        ids = jnp.asarray([0, 15], jnp.int32)  # every shard asks for both
        nids, nmask, viol = sharded_sample_neighbors(
            "data", adj, ell[0], deg[0], indptr[0], edge_dst[0],
            ids, fanout, key[0], cap,
        )
        return nids[None], nmask[None], viol[None]

    f = jax.jit(shard_map(
        hop, mesh=mesh,
        in_specs=((P("data"),) * 4 + (P(),)),
        out_specs=(P("data"), P("data"), P("data")),
    ))
    draws = 400
    keys = jax.random.split(jax.random.PRNGKey(17), draws)
    counts = {0: np.zeros(17), 15: np.zeros(17)}
    for d in range(draws):
        nids, nmask, viol = f(adj.ell, adj.degrees, adj.indptr, adj.edge_dst,
                              jnp.broadcast_to(keys[d], (8, *keys[d].shape)))
        assert not bool(np.asarray(viol).any())
        nids, nmask = np.asarray(nids), np.asarray(nmask)
        assert nmask.all()  # degree 8 >= fanout 2 everywhere
        for row, center in ((0, 0), (1, 15)):
            ids_row = nids[:, row, :].reshape(-1)
            # without replacement within each request
            for s in range(8):
                assert len(set(nids[s, row].tolist())) == fanout
            np.add.at(counts[center], ids_row, 1)
    for center in (0, 15):
        requests = draws * 8  # one request per shard per draw
        probs = counts[center][1:9] / requests
        # per-request marginal = fanout/degree = 2/8
        np.testing.assert_allclose(probs, 0.25, atol=0.02)
        assert counts[center][0] == 0 and counts[center][9:].sum() == 0


def test_sharded_sampling_hop_overflow_aborts(graph):
    """An overflowing SAMPLING hop (not just a feature gather) must set the
    violation flag and abort the fully sharded step (round-2 VERDICT item
    5b). All seeds hit shard 0's rows, so hop-1 requests pile onto one
    owner past its per-pair capacity."""
    from graphsage_tpu.data.graph import build_graph
    from graphsage_tpu.parallel.feature_store import (
        FullyShardedTrainer,
        shard_adjacency,
        sharded_sample_neighbors,
    )

    # Direct: 8 shards x 16 requests for node 0 with capacity 8 -> violated.
    edges = np.array([[0, i] for i in range(1, 9)])
    g = build_graph(np.zeros((16, 4), np.float32), np.zeros(16), edges,
                    num_classes=1, placement="host")
    mesh = make_mesh({"data": 8})
    adj = shard_adjacency(g, 8)

    def hop(ell, deg, indptr, edge_dst):
        ids = jnp.zeros((16,), jnp.int32)
        _, _, viol = sharded_sample_neighbors(
            "data", adj, ell[0], deg[0], indptr[0], edge_dst[0],
            ids, 2, jax.random.PRNGKey(0), 8,
        )
        return viol[None]

    viol = shard_map(
        hop, mesh=mesh, in_specs=(P("data"),) * 4, out_specs=P("data"),
    )(adj.ell, adj.degrees, adj.indptr, adj.edge_dst)
    assert bool(np.asarray(viol).all())

    # Trainer-level: skewed seed batch + a slack so small the 8x retry
    # ceiling stays at the 8-row capacity floor -> the ladder exhausts and
    # step() raises loudly (after warning per retry).
    model = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                      hidden_dims=(8, 8), fanouts=(4, 4))
    cfg = TrainConfig(batch_size=128, num_steps=1, test_size=40, val_size=40,
                      log_every=0)
    tr = FullyShardedTrainer(model, graph, cfg, mesh, capacity_slack=0.05)
    state = tr.init_state()
    skewed = np.zeros(128, np.int32)  # every seed owned by shard 0
    with pytest.warns(UserWarning, match="capacity exceeded"):
        with pytest.raises(ValueError, match="capacity"):
            tr.step(state, skewed)


def test_compact_sites_layout_contract():
    """compact_sites derives the expected hop-L width from the model
    (fanout + concat_self/self_loop) and rejects a frontier that does not
    match GraphSAGE.sample's layout (round-3 VERDICT item 7) — a silent
    mis-slice of the self column would corrupt every compact gather."""
    from graphsage_tpu.models.graphsage import Frontier
    from graphsage_tpu.parallel.feature_store import compact_sites

    model = GraphSAGE(in_dim=8, num_classes=2, hidden_dims=(4, 4),
                      fanouts=(3, 3))
    ids = (np.zeros(4, np.int32), np.zeros(12, np.int32),
           np.zeros(36, np.int32))
    fr = Frontier(ids=ids, masks=tuple(np.ones(x.shape, bool) for x in ids))
    (site,) = compact_sites(model, fr)
    assert site[0].shape == (12, 3)

    bad_ids = (ids[0], ids[1], np.zeros(40, np.int32))
    bad = Frontier(ids=bad_ids,
                   masks=tuple(np.ones(x.shape, bool) for x in bad_ids))
    with pytest.raises(ValueError, match="does not come from"):
        compact_sites(model, bad)

    # concat_self: column 0 carries the parent, so k_eff = fanout + 1 and
    # the 36-slot hop (valid for the plain model) must now be rejected.
    m2 = dataclasses.replace(model, concat_self=True)
    with pytest.raises(ValueError, match="does not come from"):
        compact_sites(m2, fr)
    ids_cs = (np.zeros(4, np.int32), np.zeros(16, np.int32),
              np.zeros(64, np.int32))
    fr_cs = Frontier(ids=ids_cs,
                     masks=tuple(np.ones(x.shape, bool) for x in ids_cs))
    sites = compact_sites(m2, fr_cs)
    assert sites[0][0].shape == (16, 3)  # columns 1..3 = neighbors
    assert sites[1][0].shape == (16,)    # parent self-lookup


def test_sharded_comm_stats_math():
    """Static comm-volume report: capacities match request_capacity, the
    compact/dense ratio is ~S/slack, and fully-sharded adds sampling hops."""
    from graphsage_tpu.parallel.feature_store import (
        request_capacity,
        sharded_comm_stats,
    )

    model = GraphSAGE(in_dim=1433, num_classes=7, hidden_dims=(128, 128),
                      fanouts=(10, 10))
    st = sharded_comm_stats(model, 256, 8, slack=1.5, fully_sharded=True)
    # One lookup site (pure mean): the full deepest-hop frontier per chip.
    (site,) = st["sites"]
    q = (256 // 8) * 10 * 10
    assert site["q_local"] == q
    assert site["capacity"] == request_capacity(q, 8, 1.5)
    assert st["gather_compact_bytes_per_chip_step"] < st[
        "gather_dense_bytes_per_chip_step"
    ]
    ratio = st["gather_compact_vs_dense"]
    assert 4.0 < ratio <= 8.0  # ~S/slack with rounding
    assert len(st["sampling_hops"]) == 2
    assert st["total_compact_bytes_per_chip_step"] == (
        st["gather_compact_bytes_per_chip_step"]
        + st["sampling_bytes_per_chip_step"]
    )
    # concat_self adds the self-lookup site.
    m2 = GraphSAGE(in_dim=64, num_classes=7, hidden_dims=(16, 16),
                   fanouts=(4, 4), concat_self=True)
    st2 = sharded_comm_stats(m2, 64, 8)
    assert len(st2["sites"]) == 2


# ------------------------------------------------------------- hub cache


def _hub_star_graph():
    """Undirected star cluster: nodes 0..3 are the only high-degree nodes
    (every node >= 4 attaches to node i%4), so with a 1-layer model every
    VALID deepest-hop request from seeds >= 4 targets shard 0's range and
    the top-4-by-degree hub cache covers them all."""
    from graphsage_tpu.data.graph import build_graph

    edges = np.asarray([[i, i % 4] for i in range(4, 64)])
    rng = np.random.default_rng(5)
    return build_graph(
        rng.normal(size=(64, 12)).astype(np.float32),
        np.zeros(64, np.int64), edges, num_classes=2, placement="host",
    )


def test_hub_cache_absorbs_skew_without_retry():
    """With the frozen hub cache covering the hot rows, a batch whose
    valid requests all target one owner trains at the CONFIGURED slack —
    no overflow, no retry warning; without the cache the same batch
    violates and walks the ladder."""
    import warnings

    g = _hub_star_graph()
    # in_dim <= hidden so the injected gather reads the RAW table (the
    # frozen cache's validity domain).
    model = GraphSAGE(in_dim=12, num_classes=2, hidden_dims=(16,),
                      fanouts=(4,))
    cfg = TrainConfig(batch_size=128, num_steps=1, test_size=8, val_size=8,
                      log_every=0)
    mesh = make_mesh({"data": 8})
    # 16 degree-1 seeds/shard, every valid request pointing at a hub:
    # 16 requests/shard to owner 0 vs capacity 8 at slack 1.0 -> overflow
    # without the cache; with it every slot is hub-resolved or masked and
    # spreads round-robin (exactly 8/owner = capacity, no overflow).
    seeds = (4 + np.arange(128) % 60).astype(np.int32)

    plain = ShardedFeatureTrainer(model, g, cfg, mesh,
                                  gather_mode="compact", capacity_slack=1.0)
    with pytest.warns(UserWarning, match="capacity exceeded"):
        plain.step(plain.init_state(), seeds)

    hub = ShardedFeatureTrainer(model, g, cfg, mesh, gather_mode="compact",
                                capacity_slack=1.0, hub_cache_rows=4)
    stats = hub.memory_stats()
    assert stats["hub_cache_rows"] == 4
    assert stats["hub_cache_bytes_per_chip"] > 0
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any retry warning fails the test
        state, loss = hub.step(hub.init_state(), seeds)
    assert np.isfinite(float(loss))

    # EVAL rides the cache too (round-4 review finding): the sampled eval
    # on the same skewed nodes must stay on the compact path — no
    # dense-fallback warning.
    hub_ev = ShardedFeatureTrainer(
        model, g, dataclasses.replace(cfg, eval_fanouts=(4,)), mesh,
        gather_mode="compact", capacity_slack=1.0, hub_cache_rows=4,
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        preds = hub_ev.predict(hub_ev.init_state(), seeds[:64])
    assert np.asarray(preds).shape[0] == 64


@pytest.mark.parametrize("fully", [False, True])
def test_hub_cache_exact_parity(fully):
    """Cached hub rows are bit-identical to routed rows (frozen table), so
    hub/no-hub trainers must produce identical losses step for step."""
    from graphsage_tpu.parallel.feature_store import FullyShardedTrainer

    g = power_law_graph(num_nodes=200, num_edges=800, num_feats=8,
                        num_classes=4, seed=2, homophily=0.8,
                        placement="host")
    model = GraphSAGE(in_dim=8, num_classes=4, hidden_dims=(16, 16),
                      fanouts=(4, 4))
    cfg = TrainConfig(batch_size=32, num_steps=3, learning_rate=0.5,
                      test_size=40, val_size=40, log_every=0)
    mesh = make_mesh({"data": 8})
    cls = FullyShardedTrainer if fully else ShardedFeatureTrainer
    kw = {} if fully else {"gather_mode": "compact"}
    a = cls(model, g, cfg, mesh, capacity_slack=8.0, **kw)
    b = cls(model, g, cfg, mesh, capacity_slack=8.0, hub_cache_rows=16, **kw)
    sa, sb = a.init_state(), b.init_state()
    ita, itb = a.batches(), b.batches()
    for _ in range(cfg.num_steps):
        sa, la = a.step(sa, next(ita))
        sb, lb = b.step(sb, next(itb))
        np.testing.assert_allclose(float(la), float(lb), rtol=0, atol=0)


def test_hub_cache_rejects_params_dependent_tables():
    """project-first and layer0='full' gather from params-dependent tables
    a frozen cache cannot track — construction must fail loudly."""
    g = power_law_graph(num_nodes=200, num_edges=800, num_feats=48,
                        num_classes=4, seed=2, placement="host")
    mesh = make_mesh({"data": 8})
    cfg = TrainConfig(batch_size=32, num_steps=1, test_size=40, val_size=40,
                      log_every=0)
    pf_model = GraphSAGE(in_dim=48, num_classes=4, hidden_dims=(8, 8),
                         fanouts=(4, 4))  # 48 -> 8 projects first
    with pytest.raises(ValueError, match="frozen gather table"):
        ShardedFeatureTrainer(pf_model, g, cfg, mesh, gather_mode="compact",
                              hub_cache_rows=8)
    raw_model = GraphSAGE(in_dim=8, num_classes=4, hidden_dims=(16, 16),
                          fanouts=(4, 4))
    with pytest.raises(ValueError, match="compact"):
        ShardedFeatureTrainer(
            dataclasses.replace(raw_model, in_dim=8),
            power_law_graph(num_nodes=200, num_edges=800, num_feats=8,
                            num_classes=4, seed=2, placement="host"),
            cfg, mesh, gather_mode="dense", hub_cache_rows=8,
        )


def test_hub_cache_unsupervised_smoke():
    """The degree^0.75 negatives are the hub-skew worst case; the unsup
    sharded trainer must accept the cache and train finitely."""
    from graphsage_tpu.train.unsupervised import UnsupervisedShardedTrainer

    g = power_law_graph(num_nodes=200, num_edges=800, num_feats=8,
                        num_classes=4, seed=2, homophily=0.8,
                        placement="host")
    model = GraphSAGE(in_dim=8, num_classes=4, hidden_dims=(16, 16),
                      fanouts=(4, 4), final_activation="linear")
    cfg = TrainConfig(batch_size=16, num_steps=2, log_every=0,
                      test_size=40, val_size=40, num_negatives=3,
                      walk_length=2, eval_fanouts=(4, 4))
    mesh = make_mesh({"data": 8})
    tr = UnsupervisedShardedTrainer(model, g, cfg, mesh,
                                    gather_mode="compact",
                                    capacity_slack=8.0, hub_cache_rows=16)
    st = tr.init_state()
    st, loss = tr.step(st, next(tr.batches()))
    assert np.isfinite(float(loss))


def test_distributed_windowed_sampler_uniform_marginals():
    """Windowed sampling THROUGH the owner-routed distributed hop: a
    degree-300 hub (3 CSR lane windows, the last partial with 44 >= k
    elements) must give every neighbor the k/d marginal, exactly like the
    single-chip windowed sampler."""
    from graphsage_tpu.data.graph import build_graph
    from graphsage_tpu.parallel.feature_store import (
        shard_adjacency,
        sharded_sample_neighbors,
    )

    hub_deg, k = 300, 4
    edges = np.array([[0, i] for i in range(1, hub_deg + 1)])
    g = build_graph(np.zeros((hub_deg + 8, 4), np.float32),
                    np.zeros(hub_deg + 8), edges, num_classes=1,
                    placement="host", ell_width_cap=16)
    mesh = make_mesh({"data": 8})
    adj = shard_adjacency(g, 8)
    cap = 16

    def hop(ell, deg, indptr, edge_dst, key):
        ids = jnp.zeros((2,), jnp.int32)  # every shard asks for the hub
        nids, nmask, viol = sharded_sample_neighbors(
            "data", adj, ell[0], deg[0], indptr[0], edge_dst[0],
            ids, k, key[0], cap, method="windowed",
        )
        return nids[None], nmask[None], viol[None]

    f = jax.jit(shard_map(
        hop, mesh=mesh,
        in_specs=((P("data"),) * 4 + (P(),)),
        out_specs=(P("data"), P("data"), P("data")),
    ))
    draws = 150
    keys = jax.random.split(jax.random.PRNGKey(23), draws)
    counts = np.zeros(hub_deg + 8)
    for d in range(draws):
        nids, nmask, viol = f(adj.ell, adj.degrees, adj.indptr, adj.edge_dst,
                              jnp.broadcast_to(keys[d], (8, *keys[d].shape)))
        assert not bool(np.asarray(viol).any())
        nids, nmask = np.asarray(nids), np.asarray(nmask)
        assert nmask.all()  # every window of a 300-row holds >= 4
        for s in range(8):
            for row in nids[s]:
                assert len(set(row.tolist())) == k
        np.add.at(counts, nids.reshape(-1), 1)
    assert counts[0] == 0 and counts[hub_deg + 1:].sum() == 0
    rel = counts[1:hub_deg + 1] / counts[1:hub_deg + 1].mean()
    # 8 shards x 2 requests x 150 draws x 4 = 9600 picks, ~32/neighbor.
    assert rel.min() > 0.45 and rel.max() < 1.7


def test_route_requests_sort_formulation_exact(graph, monkeypatch):
    """Above _RANK_SORT_MIN_SHARDS the router switches to the stable-sort
    rank (S-independent work); force it on the 8-shard mesh and pin the
    compact gather's exactness through that branch."""
    from graphsage_tpu.parallel import feature_store as fs

    monkeypatch.setattr(fs, "_RANK_SORT_MIN_SHARDS", 4)
    mesh = make_mesh({"data": 8})
    store = shard_features(graph.features, 8)
    rng = np.random.default_rng(9)
    ids = rng.integers(0, graph.num_nodes, size=(8, 24)).astype(np.int32)

    def f(shard, ids_local):
        return fs.sharded_row_gather_compact(
            "data", shard[0], ids_local[0], 24
        )[None]

    out = shard_map(
        f, mesh=mesh, in_specs=(P("data"), P("data")), out_specs=P("data"),
    )(store.shards, jnp.asarray(ids))
    want = np.asarray(graph.features)[ids.reshape(-1)].reshape(8, 24, -1)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6, atol=1e-6)


def test_hub_request_fraction_math():
    from graphsage_tpu.parallel.feature_store import hub_request_fraction

    deg = np.array([10, 5, 3, 1, 1], np.int32)
    np.testing.assert_allclose(hub_request_fraction(deg, 1), 0.5)
    np.testing.assert_allclose(hub_request_fraction(deg, 2), 0.75)
    np.testing.assert_allclose(hub_request_fraction(deg, 5), 1.0)
    assert hub_request_fraction(np.zeros(4), 2) == 0.0
