"""Cached layer-0 (``layer0="cached"``): the frozen-feature escape.

The feature table never trains (reference model.py:70-71,
``requires_grad=False`` — quirk Q12) and the mean aggregator is linear, so
the deepest hop's full-neighborhood aggregate ``D^-1 A X`` is a constant
per node. ``with_cached_layer0`` precomputes it once; per step the deepest
sampling hop, its ``B*prod(fanouts)`` raw-row gathers, and the backward
scatter into the table all disappear. Semantics = the reference's own
``num_sample=None`` mode (quirk Q7) at the input-closest layer: pinned
here as exact agreement with ``layer0="full"`` at ANY fanouts and with
``layer0="sampled"`` at covering fanouts.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphsage_tpu.data.graph import (
    build_graph,
    quantize_graph,
    with_cached_layer0,
)
from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.train.config import TrainConfig
from graphsage_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def graph():
    return power_law_graph(num_nodes=300, num_edges=1200, num_feats=24,
                           num_classes=5, seed=2, homophily=0.8)


def _model(graph, **kw):
    base = dict(
        in_dim=graph.num_features, num_classes=graph.num_classes,
        hidden_dims=(8, 8), fanouts=(4, 4),
        matmul_precision="highest", gather_impl="take",
    )
    base.update(kw)
    return GraphSAGE(**base)


@pytest.mark.parametrize("mode", ["plain", "concat_self", "self_loop"])
def test_cached_matches_sampled_at_covering_fanouts(graph, mode):
    """Fanout >= max degree makes the sampled deepest hop see complete
    neighborhoods — the cache must agree (same denominators, quirk Q8)."""
    max_deg = int(np.asarray(graph.degrees).max())
    kw = dict(fanouts=(max_deg, max_deg))
    if mode == "concat_self":
        kw["concat_self"] = True
    elif mode == "self_loop":
        kw["self_loop"] = True
    sampled = _model(graph, **kw)
    cached = dataclasses.replace(sampled, layer0="cached")
    gc = with_cached_layer0(graph, self_loop=(mode == "self_loop"))
    params = sampled.init(jax.random.PRNGKey(0))
    seeds = jnp.arange(64, dtype=jnp.int32)
    key = jax.random.PRNGKey(5)
    ls = np.asarray(sampled.apply(params, key, graph, seeds))
    lc = np.asarray(cached.apply(params, key, gc, seeds))
    np.testing.assert_allclose(lc, ls, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("mode", ["plain", "concat_self", "self_loop"])
def test_cached_matches_layer0_full_at_any_fanout(graph, mode):
    """layer0="full" recomputes act(W0 . mean_full) per step; "cached"
    reads the same mean from the precompute — identical logits at ANY
    upper fanouts (the two modes share the shortened frontier and RNG
    stream), with "cached" paying no per-step full-graph pass."""
    kw = {}
    if mode == "concat_self":
        kw["concat_self"] = True
    elif mode == "self_loop":
        kw["self_loop"] = True
    full = _model(graph, layer0="full", **kw)
    cached = dataclasses.replace(full, layer0="cached")
    gc = with_cached_layer0(graph, self_loop=(mode == "self_loop"))
    params = full.init(jax.random.PRNGKey(3))
    seeds = jnp.arange(48, dtype=jnp.int32)
    key = jax.random.PRNGKey(7)
    np.testing.assert_allclose(
        np.asarray(cached.apply(params, key, gc, seeds)),
        np.asarray(full.apply(params, key, graph, seeds)),
        rtol=1e-5, atol=1e-6,
    )


def test_cached_gradient_parity_with_full(graph):
    """dW must match layer0="full" exactly: the cache is not a forward-only
    shortcut — the whole training step is equivalent."""
    full = _model(graph, layer0="full")
    cached = dataclasses.replace(full, layer0="cached")
    gc = with_cached_layer0(graph)
    params = full.init(jax.random.PRNGKey(1))
    seeds = jnp.arange(32, dtype=jnp.int32)
    key = jax.random.PRNGKey(11)
    labels = jnp.take(graph.labels, seeds, axis=0)

    def loss_of(model, g):
        def fn(p):
            fr = model.sample(key, g, seeds)
            return model.loss(p, g.features, fr, labels, graph=g)
        return fn

    lf, gf = jax.value_and_grad(loss_of(full, graph))(params)
    lc, gcad = jax.value_and_grad(loss_of(cached, gc))(params)
    np.testing.assert_allclose(float(lc), float(lf), rtol=1e-5, atol=1e-7)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        gcad, gf,
    )


def test_cached_frontier_is_one_hop_shorter(graph):
    model = _model(graph, layer0="cached")
    fr = model.sample(jax.random.PRNGKey(0), graph,
                      jnp.arange(16, dtype=jnp.int32))
    assert len(fr.ids) == 2  # seeds + one sampled hop (layer-1's input)
    assert fr.ids[1].shape == (16 * 4,)


def test_cached_trains_end_to_end_with_autobuild(graph):
    """Trainer builds the cache itself when the graph lacks one."""
    model = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                      hidden_dims=(16, 16), fanouts=(4, 4), layer0="cached")
    cfg = TrainConfig(batch_size=64, num_steps=12, learning_rate=0.5,
                      test_size=60, val_size=60, log_every=0,
                      steps_per_dispatch=6, eval_fanouts=(4, 4))
    tr = Trainer(model, graph, cfg)
    assert tr.graph.layer0_cache is not None
    res = tr.run(log=None)
    assert np.isfinite(res["losses"]).all()
    assert res["losses"][-1] < res["losses"][0]
    assert 0.0 <= res["val_micro_f1"] <= 1.0


def test_cached_guards(graph):
    with pytest.raises(ValueError, match="mean aggregator"):
        GraphSAGE(in_dim=8, num_classes=2, hidden_dims=(4,), fanouts=(2,),
                  layer0="cached", aggregator="maxpool", pool_dim=4)
    with pytest.raises(ValueError, match="mean aggregator"):
        GraphSAGE(in_dim=8, num_classes=2, hidden_dims=(4, 4), fanouts=(2, 2),
                  layer0="cached", aggregator="lstm", pool_dim=4)
    model = _model(graph, layer0="cached")
    params = model.init(jax.random.PRNGKey(0))
    seeds = jnp.arange(8, dtype=jnp.int32)
    # Missing cache on the graph
    with pytest.raises(ValueError, match="with_cached_layer0"):
        model.apply(params, jax.random.PRNGKey(0), graph, seeds)
    # self_loop flavor mismatch
    gc_loop = with_cached_layer0(graph, self_loop=True)
    with pytest.raises(ValueError, match="self_loop"):
        model.apply(params, jax.random.PRNGKey(0), gc_loop, seeds)
    # Rebuilding the other flavor on a cached graph must be explicit
    with pytest.raises(ValueError, match="rebuild"):
        with_cached_layer0(gc_loop, self_loop=False)
    # Idempotent for the matching flavor
    assert with_cached_layer0(gc_loop, self_loop=True) is gc_loop


def test_cache_build_semantics_small():
    """Hand-checkable graph: path 0-1-2 plus isolated node 3. Zero-degree
    rows are 0 (guarded mean, quirk Q4); self_loop rows are
    (sum + x) / (deg + 1)."""
    feats = np.array([[1.0, 0.0], [0.0, 2.0], [4.0, 4.0], [8.0, 8.0]],
                     np.float32)
    labels = np.zeros(4, np.int64)
    g = build_graph(feats, labels, np.array([[0, 1], [1, 2]]), num_classes=2)
    m = np.asarray(with_cached_layer0(g).layer0_cache)
    np.testing.assert_allclose(m[0], [0.0, 2.0])          # N(0) = {1}
    np.testing.assert_allclose(m[1], [2.5, 2.0])          # mean of 0, 2
    np.testing.assert_allclose(m[2], [0.0, 2.0])          # N(2) = {1}
    np.testing.assert_allclose(m[3], [0.0, 0.0])          # isolated
    ml = np.asarray(with_cached_layer0(g, self_loop=True).layer0_cache)
    np.testing.assert_allclose(ml[0], [0.5, 1.0])         # (x1+x0)/2
    np.testing.assert_allclose(ml[1], [5.0 / 3, 2.0])     # (x0+x2+x1)/3
    np.testing.assert_allclose(ml[3], [8.0, 8.0])         # (x3)/1


def test_cache_host_build_matches_device_build():
    """The blocked numpy reduceat path and the jax segment-sum path are the
    same math; tiny edge_block forces multi-chunk coverage on both."""
    gd = power_law_graph(num_nodes=200, num_edges=800, num_feats=12,
                         num_classes=4, seed=3)
    gh = power_law_graph(num_nodes=200, num_edges=800, num_feats=12,
                         num_classes=4, seed=3, placement="host")
    for loop in (False, True):
        md = np.asarray(
            with_cached_layer0(gd, self_loop=loop, edge_block=128).layer0_cache
        )
        mh = np.asarray(
            with_cached_layer0(gh, self_loop=loop, edge_block=128).layer0_cache
        )
        assert isinstance(
            with_cached_layer0(gh, self_loop=loop).layer0_cache, np.ndarray
        )
        np.testing.assert_allclose(mh, md, rtol=1e-5, atol=1e-6)


def test_cached_with_quantized_features(graph):
    """Int8 feature tables build the cache from dequantized rows; the
    forward stays close to the dense-graph forward (int8 error only)."""
    gq = with_cached_layer0(quantize_graph(graph.to_host()))
    gdense = with_cached_layer0(graph)
    model = _model(graph, layer0="cached")
    params = model.init(jax.random.PRNGKey(0))
    seeds = jnp.arange(32, dtype=jnp.int32)
    key = jax.random.PRNGKey(2)
    lq = np.asarray(model.apply(params, key, gq.to_device(), seeds))
    ld = np.asarray(model.apply(params, key, gdense, seeds))
    np.testing.assert_allclose(lq, ld, rtol=0.08, atol=0.05)


def test_cached_quantized_cache_table(graph):
    """quantize=True stores the cache itself as int8 (capacity lever);
    gather_fn dispatches on the table type so the forward just works."""
    from graphsage_tpu.ops.quantize import is_quantized

    gq = with_cached_layer0(graph, quantize=True)
    assert is_quantized(gq.layer0_cache)
    gdense = with_cached_layer0(graph)
    model = _model(graph, layer0="cached")
    params = model.init(jax.random.PRNGKey(0))
    seeds = jnp.arange(32, dtype=jnp.int32)
    key = jax.random.PRNGKey(2)
    np.testing.assert_allclose(
        np.asarray(model.apply(params, key, gq, seeds)),
        np.asarray(model.apply(params, key, gdense, seeds)),
        rtol=0.08, atol=0.05,
    )


def test_cached_with_windowed_sampling(graph):
    """Upper hops keep their sampling method; cached layer 0 composes."""
    model = _model(graph, layer0="cached", sampling="windowed",
                   fanouts=(3, 3))
    gc = with_cached_layer0(graph)
    params = model.init(jax.random.PRNGKey(0))
    logits = model.apply(params, jax.random.PRNGKey(1), gc,
                         jnp.arange(16, dtype=jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()


def test_cached_single_layer_model(graph):
    """L=1: forward = cache gather + combine + project + head."""
    max_deg = int(np.asarray(graph.degrees).max())
    sampled = GraphSAGE(in_dim=graph.num_features,
                        num_classes=graph.num_classes,
                        hidden_dims=(8,), fanouts=(max_deg,),
                        matmul_precision="highest", gather_impl="take")
    cached = dataclasses.replace(sampled, layer0="cached")
    gc = with_cached_layer0(graph)
    params = sampled.init(jax.random.PRNGKey(1))
    seeds = jnp.arange(32, dtype=jnp.int32)
    key = jax.random.PRNGKey(9)
    np.testing.assert_allclose(
        np.asarray(cached.apply(params, key, gc, seeds)),
        np.asarray(sampled.apply(params, key, graph, seeds)),
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.parametrize("mode", ["dense", "compact"])
def test_cached_sharded_feature_trainer_parity(graph, mode):
    """Node-sharded cached mode: the aggregate cache shards like the
    features and the table gather rides the same cross-shard exchange —
    sampling is replicated, so losses match the single-device trainer
    step for step."""
    from graphsage_tpu.parallel.feature_store import ShardedFeatureTrainer
    from graphsage_tpu.parallel.mesh import make_mesh

    gh = graph.to_host()
    model = _model(graph, layer0="cached")
    cfg = TrainConfig(batch_size=32, num_steps=3, learning_rate=0.5,
                      test_size=60, val_size=60, log_every=0,
                      eval_fanouts=(4, 4))
    single = Trainer(model, gh, cfg)
    sharded = ShardedFeatureTrainer(model, gh, cfg, make_mesh({"data": 8}),
                                    gather_mode=mode)
    assert sharded.graph.layer0_cache is None  # never replicated on device
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


def test_cached_sharded_concat_self_parity(graph):
    """concat_self adds a second (raw-feature) gather site at the same hop;
    both sites route through the compact exchange."""
    from graphsage_tpu.parallel.feature_store import ShardedFeatureTrainer
    from graphsage_tpu.parallel.mesh import make_mesh

    gh = graph.to_host()
    model = _model(graph, layer0="cached", concat_self=True)
    cfg = TrainConfig(batch_size=32, num_steps=2, learning_rate=0.5,
                      test_size=60, val_size=60, log_every=0,
                      eval_fanouts=(4, 4))
    single = Trainer(model, gh, cfg)
    sharded = ShardedFeatureTrainer(model, gh, cfg, make_mesh({"data": 8}),
                                    gather_mode="compact")
    s1, s2 = single.init_state(), sharded.init_state()
    it1, it2 = single.batches(), sharded.batches()
    for _ in range(cfg.num_steps):
        s1, l1 = single.step(s1, next(it1))
        s2, l2 = sharded.step(s2, next(it2))
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5, atol=1e-6)


def test_cached_fully_sharded_parity(graph):
    """FullyShardedTrainer: the cache shards ride after the adjacency
    leaves; distributed sampling is deterministic at covering fanouts, so
    training AND the distributed eval match the single-device trainer."""
    from graphsage_tpu.parallel.feature_store import FullyShardedTrainer
    from graphsage_tpu.parallel.mesh import make_mesh

    gh = graph.to_host()
    max_deg = int(np.asarray(graph.degrees).max())
    model = _model(graph, layer0="cached", fanouts=(max_deg, max_deg))
    cfg = TrainConfig(batch_size=32, num_steps=2, learning_rate=0.5,
                      test_size=60, val_size=60, log_every=0,
                      eval_fanouts=(max_deg, max_deg))
    single = Trainer(model, gh, cfg)
    fully = FullyShardedTrainer(model, gh, cfg, make_mesh({"data": 8}),
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


def test_cached_sharded_quantized_cache(graph):
    """Quantized graphs shard a quantized cache: int8 rows + scales cross
    the wire; training stays close to the dense sharded run."""
    from graphsage_tpu.parallel.feature_store import ShardedFeatureTrainer
    from graphsage_tpu.parallel.mesh import make_mesh

    gq = quantize_graph(graph.to_host())
    model = _model(graph, layer0="cached")
    cfg = TrainConfig(batch_size=32, num_steps=3, learning_rate=0.5,
                      test_size=60, val_size=60, log_every=0,
                      eval_fanouts=(4, 4))
    tr = ShardedFeatureTrainer(model, gq, cfg, make_mesh({"data": 8}),
                               gather_mode="compact")
    assert tr._cache_quantized
    st = tr.init_state()
    it = tr.batches()
    losses = []
    for _ in range(cfg.num_steps):
        st, l = tr.step(st, next(it))
        losses.append(float(l))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_cached_comm_stats(graph):
    """Comm volume accounting covers the cached mode: F-wide table rows at
    the hop layer 1 consumes, no per-step layer-0 build exchange at all."""
    from graphsage_tpu.parallel.feature_store import sharded_comm_stats

    model = _model(graph, layer0="cached")
    stats = sharded_comm_stats(model, 32, 8, num_nodes=graph.num_nodes)
    assert "layer0_allgather_bytes_per_chip_step" not in stats
    assert len(stats["sites"]) == 1
    m2 = _model(graph, layer0="cached", concat_self=True)
    assert len(sharded_comm_stats(m2, 32, 8)["sites"]) == 2
    # fully_sharded sampling volume counts the cached frontier's hops
    # (L-1), not L — a phantom deepest hop would overstate the traffic
    full = sharded_comm_stats(model, 32, 8, fully_sharded=True)
    assert len(full["sampling_hops"]) == model.num_layers - 1


def test_cached_rejects_loader_feature_store(graph):
    from graphsage_tpu.parallel.feature_store import (
        ShardedFeatureTrainer,
        shard_features,
    )
    from graphsage_tpu.parallel.mesh import make_mesh

    gh = graph.to_host()
    store = shard_features(np.asarray(gh.features), 8)
    model = _model(graph, layer0="cached")
    cfg = TrainConfig(batch_size=32, num_steps=1, test_size=60, val_size=60,
                      eval_fanouts=(4, 4))
    with pytest.raises(ValueError, match="cache"):
        ShardedFeatureTrainer(model, gh, cfg, make_mesh({"data": 8}),
                              feature_store=store)


def test_cached_hub_cache_exact_parity():
    """The aggregate cache is frozen, so a hub cache built from ITS rows is
    exact (round-5): hub/no-hub cached trainers must produce identical
    losses step for step — the flagship mode and the skew lever compose."""
    from graphsage_tpu.parallel.feature_store import ShardedFeatureTrainer
    from graphsage_tpu.parallel.mesh import make_mesh

    g = power_law_graph(num_nodes=200, num_edges=800, num_feats=8,
                        num_classes=4, seed=2, homophily=0.8,
                        placement="host")
    model = GraphSAGE(in_dim=8, num_classes=4, hidden_dims=(16, 16),
                      fanouts=(4, 4), layer0="cached")
    cfg = TrainConfig(batch_size=32, num_steps=3, learning_rate=0.5,
                      test_size=40, val_size=40, log_every=0,
                      eval_fanouts=(4, 4))
    mesh = make_mesh({"data": 8})
    a = ShardedFeatureTrainer(model, g, cfg, mesh, gather_mode="compact",
                              capacity_slack=8.0)
    b = ShardedFeatureTrainer(model, g, cfg, mesh, gather_mode="compact",
                              capacity_slack=8.0, hub_cache_rows=16)
    assert b.memory_stats()["hub_cache_rows"] == 16
    sa, sb = a.init_state(), b.init_state()
    ita, itb = a.batches(), b.batches()
    for _ in range(cfg.num_steps):
        sa, la = a.step(sa, next(ita))
        sb, lb = b.step(sb, next(itb))
        np.testing.assert_allclose(float(la), float(lb), rtol=0, atol=0)
    # eval rides the hub too
    np.testing.assert_array_equal(
        np.asarray(a.predict(sa, np.arange(32, dtype=np.int32))),
        np.asarray(b.predict(sb, np.arange(32, dtype=np.int32))),
    )


def test_cached_hub_cache_guards(graph):
    """concat_self (two sites share the exchange closure) and quantized
    caches (hub rows would need scale plumbing) must fail loudly."""
    from graphsage_tpu.parallel.feature_store import ShardedFeatureTrainer
    from graphsage_tpu.parallel.mesh import make_mesh

    gh = graph.to_host()
    cfg = TrainConfig(batch_size=32, num_steps=1, test_size=60, val_size=60,
                      log_every=0, eval_fanouts=(4, 4))
    mesh = make_mesh({"data": 8})
    with pytest.raises(ValueError, match="pure-mean"):
        ShardedFeatureTrainer(
            _model(graph, layer0="cached", concat_self=True), gh, cfg, mesh,
            gather_mode="compact", hub_cache_rows=8,
        )
    gq = quantize_graph(gh)
    with pytest.raises(ValueError, match="QUANTIZED"):
        ShardedFeatureTrainer(
            _model(graph, layer0="cached"), gq, cfg, mesh,
            gather_mode="compact", hub_cache_rows=8,
        )


def test_cached_review_regressions(graph):
    """Round-5 review findings, pinned:

    1. FullyShardedTrainer must NOT device-place the full [N, F] cache
       (only the shard stacks riding adjacency_shards).
    2. A pre-built wrong-self_loop-flavor cache must be rejected at
       sharded-trainer construction (forward's check is bypassed by the
       injected table).
    3. The base Trainer's auto-build keeps an int8 cache for int8 graphs.
    4. with_cached_layer0 idempotency rejects a quantize mismatch instead
       of silently returning the dense cache.
    5. sharded_comm_stats prices cached rows in the FEATURE dtype (the
       cache build dtype), not compute_dtype.
    """
    import jax.numpy as jnp

    from graphsage_tpu.ops.quantize import is_quantized
    from graphsage_tpu.parallel.feature_store import (
        FullyShardedTrainer,
        ShardedFeatureTrainer,
        sharded_comm_stats,
    )
    from graphsage_tpu.parallel.mesh import make_mesh

    gh = graph.to_host()
    model = _model(graph, layer0="cached")
    cfg = TrainConfig(batch_size=32, num_steps=1, test_size=60, val_size=60,
                      log_every=0, eval_fanouts=(4, 4))
    mesh = make_mesh({"data": 8})

    # 1. no replicated cache on the fully-sharded device payload
    fully = FullyShardedTrainer(model, gh, cfg, mesh, capacity_slack=8.0)
    assert fully.graph.layer0_cache is None

    # 2. wrong flavor rejected at construction
    g_loop = with_cached_layer0(gh, self_loop=True)
    with pytest.raises(ValueError, match="self_loop"):
        ShardedFeatureTrainer(model, g_loop, cfg, mesh)

    # 3. auto-build keeps int8 caches int8
    tr = Trainer(model, quantize_graph(gh).to_device(), cfg)
    assert is_quantized(tr.graph.layer0_cache)

    # 4. idempotency quantize-mismatch guard
    with pytest.raises(ValueError, match="quantize"):
        with_cached_layer0(with_cached_layer0(gh), quantize=True)

    # 5. comm stats use the feature dtype for cached rows (dense volume is
    # pure row bytes, so f32 rows are exactly 2x bf16 rows; compact adds
    # id traffic on top)
    mc = dataclasses.replace(model, compute_dtype=jnp.bfloat16)
    f32 = sharded_comm_stats(mc, 32, 8, feature_dtype=jnp.float32)
    bf16 = sharded_comm_stats(mc, 32, 8, feature_dtype=jnp.bfloat16)
    # before the fix both calls priced rows at compute_dtype (bf16) and
    # returned identical volumes; the delta is exactly 2 bytes per feature
    # per exchanged row slot
    delta = (f32["gather_dense_bytes_per_chip_step"]
             - bf16["gather_dense_bytes_per_chip_step"])
    assert delta > 0 and delta % (2 * graph.num_features) == 0
    assert f32["gather_compact_bytes_per_chip_step"] > (
        bf16["gather_compact_bytes_per_chip_step"]
    )


def test_cached_review_regressions_round2(graph):
    """Second review pass, pinned:

    1. quantize_graph DROPS a pre-built cache (it was computed from the
       un-quantized features — the cached==sampled contract would silently
       break; the auto-build recomputes int8 from the quantized table).
    2. memory_stats counts the cache shard store (a second graph-sized
       per-chip table) in the claimed residency.
    """
    from graphsage_tpu.ops.quantize import is_quantized
    from graphsage_tpu.parallel.feature_store import ShardedFeatureTrainer
    from graphsage_tpu.parallel.mesh import make_mesh

    gh = graph.to_host()

    # 1. stale-cache drop
    gq = quantize_graph(with_cached_layer0(gh))
    assert gq.layer0_cache is None
    assert is_quantized(gq.features)

    # 2. cached-mode residency accounting
    model = _model(graph, layer0="cached")
    cfg = TrainConfig(batch_size=32, num_steps=1, test_size=60, val_size=60,
                      log_every=0, eval_fanouts=(4, 4))
    mesh = make_mesh({"data": 8})
    plain = ShardedFeatureTrainer(_model(graph), gh, cfg, mesh)
    cached = ShardedFeatureTrainer(model, gh, cfg, mesh)
    sp, sc = plain.memory_stats(), cached.memory_stats()
    assert "layer0_cache_bytes_per_chip" not in sp
    assert sc["layer0_cache_bytes_per_chip"] > 0
    assert sc["feature_bytes_per_chip"] == (
        sp["feature_bytes_per_chip"] + sc["layer0_cache_bytes_per_chip"]
    )
