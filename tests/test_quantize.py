"""Int8 quantized feature tables (ops/quantize.py, Graph.quantize_graph).

Strategy: the quantization ERROR is a modeling choice (bounded, tested once);
the PIPELINE is tested sharply by pre-quantizing the inputs — when the dense
table already equals ``dequantize(quantize(x))``, the quantized forward must
agree with the dense forward to numerical tolerance on every path (sampled
mean project-first and mean-first, concat_self/self_loop, maxpool,
layer0="full", full-graph), because representation is then the only
difference. The table is frozen (reference model.py:70-71), so training
through a quantized graph only changes where layer 0 reads its rows."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphsage_tpu.data.graph import build_graph, quantize_graph, relabel_graph
from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.ops.quantize import (
    QuantizedTable,
    dequantize,
    gather_dequant,
    gather_mean_dequant,
    is_quantized,
    project_table,
    quantize_features,
)
from graphsage_tpu.train.config import TrainConfig
from graphsage_tpu.train.trainer import Trainer


# --------------------------------------------------------------- primitives


def test_scale_lane_gather_matches_take_above_threshold():
    """At N >= the ROOFLINE §5.1a slow-gather threshold the per-row scale
    lookup routes through the [N/128, 128] lane view (fast gather region);
    it must be bit-equal to the plain jnp.take path, including at the
    padded tail and with repeated ids."""
    from graphsage_tpu.ops.quantize import (
        _SCALE_LANE_GATHER_MIN_ROWS,
        _gather_scale,
    )

    n = _SCALE_LANE_GATHER_MIN_ROWS + 37  # un-aligned tail exercises the pad
    rng = np.random.default_rng(3)
    scale = jnp.asarray(rng.gamma(1.0, 2.0, (n, 1)), jnp.float32)
    ids = jnp.asarray(
        np.concatenate([
            rng.integers(0, n, 4096),
            [0, n - 1, n - 1, 127, 128, n - 37],  # boundaries + repeats
        ]),
        jnp.int32,
    )
    got = _gather_scale(scale, ids.reshape(-1, 2))
    want = jnp.take(scale, ids.reshape(-1, 2), axis=0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # And through the public entry points on a big table.
    q = jnp.asarray(rng.integers(-127, 128, (n, 8)), jnp.int8)
    qt = QuantizedTable(q=q, scale=scale)
    rows = gather_dequant(qt, ids[:64])
    want_rows = (
        jnp.take(q, ids[:64], axis=0).astype(jnp.float32)
        * jnp.take(scale, ids[:64], axis=0)
    )
    np.testing.assert_allclose(np.asarray(rows), np.asarray(want_rows),
                               rtol=0, atol=0)


def test_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64, 33)).astype(np.float32) * rng.gamma(1, 5, (64, 1))
    x[7] = 0.0  # all-zero row must survive exactly
    qt = quantize_features(x)
    dq = np.asarray(dequantize(qt))
    bound = np.asarray(qt.scale) / 2 + 1e-7
    assert np.all(np.abs(x - dq) <= bound)
    assert np.all(dq[7] == 0)
    assert np.abs(np.asarray(qt.q)).max() <= 127


def test_quantize_numpy_stays_host():
    x = np.random.default_rng(1).normal(size=(10, 5)).astype(np.float32)
    qt = quantize_features(x)
    assert isinstance(qt.q, np.ndarray) and isinstance(qt.scale, np.ndarray)
    jt = quantize_features(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(jt.q), qt.q)
    np.testing.assert_allclose(np.asarray(jt.scale), qt.scale)


def test_shape_dtype_nbytes_mirror_dense():
    x = np.random.default_rng(2).normal(size=(48, 16)).astype(np.float32)
    qt = quantize_features(jnp.asarray(x))
    assert qt.shape == (48, 16)
    assert jnp.dtype(qt.dtype).itemsize == 1
    assert qt.nbytes == 48 * 16 + 48 * 4


def test_gather_dequant_matches_dense_rows():
    rng = np.random.default_rng(3)
    qt = quantize_features(jnp.asarray(rng.normal(size=(40, 9)), jnp.float32))
    ids = jnp.asarray(rng.integers(0, 40, (6, 4)), jnp.int32)
    got = gather_dequant(qt, ids)
    want = jnp.take(dequantize(qt), ids, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_gather_mean_dequant_matches_dense_mean():
    rng = np.random.default_rng(4)
    qt = quantize_features(jnp.asarray(rng.normal(size=(40, 9)), jnp.float32))
    idx = jnp.asarray(rng.integers(0, 40, (7, 5)), jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, (7, 5)), bool)
    got = np.asarray(gather_mean_dequant(qt, idx, mask))
    dense = np.asarray(dequantize(qt))
    m = np.asarray(mask).astype(np.float32)[..., None]
    want = (dense[np.asarray(idx)] * m).sum(-2) / np.maximum(m.sum(-2), 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("wdtype", [jnp.float32, jnp.bfloat16])
def test_project_table_matches_dequant_then_matmul(wdtype):
    rng = np.random.default_rng(5)
    qt = quantize_features(jnp.asarray(rng.normal(size=(30, 12)), jnp.float32))
    w = jnp.asarray(rng.normal(size=(12, 8)), wdtype)
    got = np.asarray(project_table(qt, w))
    want = np.asarray(
        jnp.einsum(
            "nf,fo->no",
            dequantize(qt).astype(jnp.float32),
            w.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


# ------------------------------------------------------------ graph plumbing


@pytest.fixture(scope="module")
def dense_graph():
    g = power_law_graph(
        num_nodes=300, num_edges=1200, num_feats=24, num_classes=5,
        seed=7, homophily=0.8,
    )
    # Pre-quantize the features so quantized-vs-dense pipeline comparisons
    # are exact (representation is the only difference).
    dq = np.asarray(dequantize(quantize_features(np.asarray(g.features))))
    return g.replace(features=jnp.asarray(dq))


def test_quantize_graph_idempotent_and_placement(dense_graph):
    qg = quantize_graph(dense_graph)
    assert is_quantized(qg.features)
    assert quantize_graph(qg) is qg
    assert not qg.on_host
    host = qg.to_host()
    assert host.on_host
    back = host.to_device()
    assert not back.on_host
    np.testing.assert_array_equal(np.asarray(back.features.q), np.asarray(qg.features.q))


def test_host_graph_quantizes_in_numpy():
    rng = np.random.default_rng(8)
    feats = rng.normal(size=(20, 6)).astype(np.float32)
    labels = rng.integers(0, 3, 20)
    edges = rng.integers(0, 20, (40, 2))
    g = build_graph(feats, labels, edges, placement="host")
    qg = quantize_graph(g)
    assert qg.on_host
    assert isinstance(qg.features.q, np.ndarray)


def test_relabel_rejects_quantized(dense_graph):
    qg = quantize_graph(dense_graph)
    with pytest.raises(ValueError, match="relabel before quantizing"):
        relabel_graph(qg, np.arange(qg.num_nodes)[::-1])


# ------------------------------------------------------- forward-path parity


MODES = [
    "mean_pf",        # project-first forced (int8 contraction path)
    "mean_nopf",      # mean-first (gather_mean_dequant path)
    "concat_self",
    "self_loop",
    "maxpool",
    "layer0_full",            # int8 pf table build (no dense transient)
    "layer0_full_self_loop",
    "layer0_full_concat",
    "layer0_full_maxpool",    # dequant-transient table build
]


def _model(graph, mode):
    kw = dict(
        in_dim=graph.num_features, num_classes=graph.num_classes,
        hidden_dims=(8, 8), fanouts=(6, 6),
        matmul_precision="highest", gather_impl="take",
    )
    if mode == "mean_pf":
        kw["project_first"] = True
    elif mode == "mean_nopf":
        kw["project_first"] = False
    elif mode == "concat_self":
        kw["concat_self"] = True
        kw["project_first"] = True
    elif mode == "self_loop":
        kw["self_loop"] = True
    elif mode == "maxpool":
        kw["aggregator"] = "maxpool"
        kw["pool_dim"] = 12
    elif mode.startswith("layer0_full"):
        kw["layer0"] = "full"
        if mode.endswith("self_loop"):
            kw["self_loop"] = True
        elif mode.endswith("concat"):
            kw["concat_self"] = True
        elif mode.endswith("maxpool"):
            kw["aggregator"] = "maxpool"
            kw["pool_dim"] = 12
    return GraphSAGE(**kw)


@pytest.mark.parametrize("mode", MODES)
def test_forward_parity_on_prequantized_features(dense_graph, mode):
    qg = quantize_graph(dense_graph)
    model = _model(dense_graph, mode)
    params = model.init(jax.random.PRNGKey(0))
    seeds = jnp.arange(48, dtype=jnp.int32)
    frontier = model.sample(jax.random.PRNGKey(3), dense_graph, seeds)
    dense = np.asarray(
        model.forward(params, dense_graph.features, frontier, graph=dense_graph)
    )
    quant = np.asarray(model.forward(params, qg.features, frontier, graph=qg))
    np.testing.assert_allclose(quant, dense, rtol=2e-4, atol=2e-5)


def test_full_graph_forward_parity(dense_graph):
    qg = quantize_graph(dense_graph)
    model = _model(dense_graph, "mean_pf")
    params = model.init(jax.random.PRNGKey(1))
    dense = np.asarray(model.forward_full_graph(params, dense_graph))
    quant = np.asarray(model.forward_full_graph(params, qg))
    np.testing.assert_allclose(quant, dense, rtol=2e-4, atol=2e-5)


def test_injected_project_first_is_byte_aware():
    """Dense keeps the width rule (d_in > d0); int8 compares actual bytes:
    projecting to 4*d0-byte f32 rows only pays vs (F + 4)-byte int8 rows."""
    m = GraphSAGE(in_dim=32, num_classes=5, hidden_dims=(16, 16),
                  fanouts=(4, 4))
    assert m.injected_layer0_project_first(quantized=False)  # 32 > 16
    assert not m.injected_layer0_project_first(quantized=True)  # 64 > 36
    wide = GraphSAGE(in_dim=602, num_classes=5, hidden_dims=(128, 128),
                     fanouts=(4, 4))
    assert wide.injected_layer0_project_first(quantized=True)  # 512 < 606
    forced = dataclasses.replace(m, project_first=True)
    assert forced.injected_layer0_project_first(quantized=True)


# ------------------------------------------------------------- sharded store


@pytest.fixture(scope="module")
def host_graph():
    """Host-resident pre-quantized-representable twin for the sharded
    trainers (they slice features in numpy)."""
    g = power_law_graph(
        num_nodes=400, num_edges=1600, num_feats=32, num_classes=5,
        seed=3, homophily=0.8, placement="host",
    )
    dq = np.asarray(dequantize(quantize_features(np.asarray(g.features))))
    return g.replace(features=dq.astype(np.float32))


@pytest.fixture(scope="module")
def mesh8():
    from graphsage_tpu.parallel.mesh import make_mesh

    return make_mesh({"data": 8})


def _sharded_pair(host_graph, mesh8, cls, **kw):
    from graphsage_tpu.train.config import TrainConfig as TC

    model = GraphSAGE(
        in_dim=32, num_classes=5, hidden_dims=(16, 16), fanouts=(4, 4),
        matmul_precision="highest", gather_impl="take",
    )
    cfg = TC(batch_size=64, num_steps=4, seed=0, log_every=0,
             test_size=80, val_size=40, eval_fanouts=(8, 8))
    dense = cls(model, host_graph, cfg, mesh8, capacity_slack=8.0, **kw)
    quant = cls(model, quantize_graph(host_graph), cfg, mesh8,
                capacity_slack=8.0, **kw)
    return dense, quant


@pytest.mark.parametrize("mode", ["dense", "compact"])
def test_sharded_feature_trainer_quantized_parity(host_graph, mesh8, mode):
    """Quantized sharded training matches the dense twin exactly on
    pre-quantized features — through the int8 psum_scatter (dense mode) or
    the int8 rows + scales all_to_all (compact mode), and despite the two
    taking DIFFERENT project-first paths (byte-aware rule: 4*16 > 32+4 so
    int8 exchanges raw rows while f32 projects first) — the reorder
    identity holds across representations."""
    from graphsage_tpu.parallel.feature_store import ShardedFeatureTrainer

    dense, quant = _sharded_pair(
        host_graph, mesh8, ShardedFeatureTrainer, gather_mode=mode
    )
    sd, sq = dense.init_state(), quant.init_state()
    seeds = np.arange(64) % host_graph.num_nodes
    for _ in range(3):
        sd, ld = dense.step(sd, seeds)
        sq, lq = quant.step(sq, seeds)
    np.testing.assert_allclose(float(lq), float(ld), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        quant.predict(sq, np.arange(32)), dense.predict(sd, np.arange(32))
    )


def test_fully_sharded_trainer_quantized_parity(host_graph, mesh8):
    """FullyShardedTrainer: distributed sampling + compact int8 gather."""
    from graphsage_tpu.parallel.feature_store import FullyShardedTrainer

    dense, quant = _sharded_pair(host_graph, mesh8, FullyShardedTrainer)
    sd, sq = dense.init_state(), quant.init_state()
    seeds = np.arange(64) % host_graph.num_nodes
    for _ in range(3):
        sd, ld = dense.step(sd, seeds)
        sq, lq = quant.step(sq, seeds)
    np.testing.assert_allclose(float(lq), float(ld), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        quant.predict(sq, np.arange(32)), dense.predict(sd, np.arange(32))
    )


def test_dp_tp_sharded_trainer_quantized_parity(host_graph):
    """ShardedTrainer (DP over seeds + TP over the feature dim): the q
    table splits on the feature axis like a dense table while the [N, 1]
    scale column replicates (graph_shardings special-cases the subtree);
    lockstep-equal to the dense twin on pre-quantized features."""
    from graphsage_tpu.parallel.distributed import ShardedTrainer
    from graphsage_tpu.parallel.mesh import make_mesh
    from graphsage_tpu.train.config import TrainConfig as TC

    graph = host_graph.to_device()
    model = GraphSAGE(
        in_dim=32, num_classes=5, hidden_dims=(16, 16), fanouts=(4, 4),
        matmul_precision="highest", gather_impl="take",
    )
    cfg = TC(batch_size=64, num_steps=4, seed=0, log_every=0,
             test_size=80, val_size=40)
    mesh = make_mesh({"data": 4, "model": 2})
    dense = ShardedTrainer(model, graph, cfg, mesh)
    quant = ShardedTrainer(model, quantize_graph(graph), cfg, mesh)
    sd, sq = dense.init_state(), quant.init_state()
    seeds = np.arange(64) % graph.num_nodes
    for _ in range(3):
        sd, ld = dense.step(sd, seeds)
        sq, lq = quant.step(sq, seeds)
    np.testing.assert_allclose(float(lq), float(ld), rtol=1e-5, atol=1e-6)


def test_sharded_memory_and_comm_stats_quantized(host_graph, mesh8):
    from graphsage_tpu.parallel.feature_store import (
        FullyShardedTrainer,
        sharded_comm_stats,
        shard_features,
    )

    qt = quantize_features(np.asarray(host_graph.features))
    store = shard_features(qt, 8)
    stats = store.memory_stats()
    # int8 row + 4-byte scale per row, per chip.
    assert stats["feature_bytes_per_chip"] == store.rows_per_shard * (32 + 4)
    model = GraphSAGE(in_dim=32, num_classes=5, hidden_dims=(16, 16),
                      fanouts=(4, 4))
    cq = sharded_comm_stats(model, 64, 8, quantized=True)
    cd = sharded_comm_stats(model, 64, 8)
    assert (
        cq["gather_compact_bytes_per_chip_step"]
        < cd["gather_compact_bytes_per_chip_step"]
    )


# ------------------------------------------------------------------ training


def test_trainer_on_quantized_graph_learns(dense_graph):
    qg = quantize_graph(dense_graph)
    model = GraphSAGE(
        in_dim=qg.num_features, num_classes=qg.num_classes,
        hidden_dims=(16, 16), fanouts=(5, 5),
    )
    trainer = Trainer(
        model, qg,
        TrainConfig(
            batch_size=128, num_steps=60, learning_rate=0.5, seed=0,
            log_every=0, test_size=60, val_size=40,
        ),
    )
    result = trainer.run(log=None)
    losses = np.asarray(result["losses"])
    assert losses[-10:].mean() < losses[:10].mean() * 0.7
    # Eval path (full-graph predict) works against the quantized table too.
    preds = trainer.predict(result["state"], np.arange(64))
    assert np.asarray(preds).shape[0] == 64
