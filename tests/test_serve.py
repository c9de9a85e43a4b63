"""ServingEngine: table-mode parity with the deterministic trainer eval,
sampled-mode determinism, bucket padding, refresh semantics
(docs/SERVING.md; reference inference surface = model.py:104-105)."""

import jax
import numpy as np
import pytest

from graphsage_tpu.data.graph import build_graph
from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.serve import ServingEngine
from graphsage_tpu.train.config import TrainConfig
from graphsage_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def graph():
    return power_law_graph(num_nodes=300, num_edges=1200, num_feats=32,
                           num_classes=4, seed=3, homophily=0.8)


@pytest.fixture(scope="module")
def trained(graph):
    model = GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                      hidden_dims=(16, 16), fanouts=(5, 5),
                      matmul_precision="highest")
    cfg = TrainConfig(batch_size=64, num_steps=8, learning_rate=0.5,
                      test_size=60, val_size=60, log_every=0)
    tr = Trainer(model, graph, cfg)
    st = tr.init_state()
    it = tr.batches()
    for _ in range(cfg.num_steps):
        st, _ = tr.step(st, next(it))
    return model, tr, st


def test_table_mode_matches_deterministic_eval(graph, trained):
    model, tr, st = trained
    eng = ServingEngine(model, graph, st.params, batch_buckets=(64,))
    nodes = np.arange(graph.num_nodes)
    np.testing.assert_array_equal(eng.predict(nodes), tr.predict(st, nodes))
    # The exported table IS embed_full_graph.
    np.testing.assert_allclose(
        np.asarray(eng.table),
        np.asarray(model.embed_full_graph(st.params, graph)),
        rtol=1e-6, atol=1e-6,
    )


def test_bucket_padding_and_repeats(graph, trained):
    model, _, st = trained
    eng = ServingEngine(model, graph, st.params, batch_buckets=(16, 64))
    # Sizes below, between, and beyond the buckets (beyond -> multiple of 64),
    # with repeated ids — results must be per-row independent of padding.
    whole = eng.logits(np.arange(200))
    for ids in ([3], [7, 7, 7], list(range(40)), list(range(150))):
        got = eng.logits(np.asarray(ids))
        assert got.shape == (len(ids), graph.num_classes)
        np.testing.assert_allclose(got, whole[np.asarray(ids)],
                                   rtol=1e-6, atol=1e-6)


def test_refresh_swaps_parameters(graph, trained):
    model, _, st = trained
    eng = ServingEngine(model, graph, st.params, batch_buckets=(32,))
    before = eng.logits(np.arange(32))
    fresh = model.init(jax.random.PRNGKey(99))
    eng.refresh(fresh)
    after = eng.logits(np.arange(32))
    assert not np.allclose(before, after)
    eng.refresh(st.params)
    np.testing.assert_allclose(eng.logits(np.arange(32)), before,
                               rtol=1e-6, atol=1e-6)


def test_sampled_mode_deterministic_and_covering_parity(graph, trained):
    model, _, st = trained
    max_deg = int(np.asarray(graph.degrees).max())
    eng_s = ServingEngine(model, graph, st.params, mode="sampled",
                          batch_buckets=(64,),
                          eval_fanouts=(max_deg, max_deg))
    nodes = np.arange(64)
    a, b = eng_s.logits(nodes), eng_s.logits(nodes)
    np.testing.assert_array_equal(a, b)  # fixed key -> identical answers
    # Covering fanouts see complete neighborhoods == the table tier.
    eng_t = ServingEngine(model, graph, st.params, batch_buckets=(64,))
    np.testing.assert_allclose(a, eng_t.logits(nodes), rtol=1e-4, atol=1e-5)


def test_sampled_mode_layer0_full(graph, trained):
    """A layer0='full' model serves through the sampled engine (the
    shared-table layer 0 rides model.forward's graph= path)."""
    import dataclasses

    model, _, st = trained
    m0 = dataclasses.replace(model, layer0="full")
    max_deg = int(np.asarray(graph.degrees).max())
    eng = ServingEngine(m0, graph, st.params, mode="sampled",
                        batch_buckets=(32,),
                        eval_fanouts=(max_deg, max_deg))
    eng_t = ServingEngine(model, graph, st.params, batch_buckets=(32,))
    nodes = np.arange(32)
    # Covering fanouts + full layer 0 == deterministic table tier.
    np.testing.assert_allclose(eng.logits(nodes), eng_t.logits(nodes),
                               rtol=1e-4, atol=1e-5)


def test_sampled_mode_layer0_cached(graph, trained):
    """A layer0='cached' model serves through the sampled engine (the
    frozen-aggregate cache rides the graph payload); at covering fanouts
    cached + complete upper hops == the deterministic table tier."""
    import dataclasses

    from graphsage_tpu.data.graph import with_cached_layer0

    model, _, st = trained
    mc = dataclasses.replace(model, layer0="cached")
    gc = with_cached_layer0(graph)
    max_deg = int(np.asarray(graph.degrees).max())
    eng = ServingEngine(mc, gc, st.params, mode="sampled",
                        batch_buckets=(32,),
                        eval_fanouts=(max_deg, max_deg))
    eng_t = ServingEngine(model, graph, st.params, batch_buckets=(32,))
    nodes = np.arange(32)
    np.testing.assert_allclose(eng.logits(nodes), eng_t.logits(nodes),
                               rtol=1e-4, atol=1e-5)


def test_embed_surface(graph, trained):
    model, _, st = trained
    eng = ServingEngine(model, graph, st.params, batch_buckets=(16,))
    e = eng.embed(np.arange(10))
    assert e.shape == (10, model.hidden_dims[-1])
    assert e.dtype == np.float32


def test_host_graph_is_device_placed():
    edges = np.array([[0, 1], [1, 2], [2, 3], [3, 0], [4, 5], [5, 0]])
    feats = np.arange(6 * 4, dtype=np.float32).reshape(6, 4)
    labels = np.array([0, 1, 0, 1, 0, 1])
    host = build_graph(feats, labels, edges, num_classes=2, placement="host")
    assert host.on_host
    model = GraphSAGE(in_dim=host.num_features, num_classes=host.num_classes,
                      hidden_dims=(8, 8), fanouts=(3, 3))
    eng = ServingEngine(model, host, model.init(jax.random.PRNGKey(0)),
                        batch_buckets=(8,))
    assert eng.predict([0, 1, 2]).shape == (3,)


@pytest.mark.parametrize("agg", ["mean", "maxpool"])
def test_sharded_table_tier_matches_replicated(graph, agg):
    """mesh= shards the table tier: halo refresh + cross-shard row gather
    must reproduce the replicated engine exactly; the table stays
    shard-stacked (nothing [N]-sized replicated by the refresh)."""
    from graphsage_tpu.parallel.mesh import make_mesh

    kw = dict(in_dim=graph.num_features, num_classes=graph.num_classes,
              hidden_dims=(16, 16), fanouts=(5, 5),
              matmul_precision="highest")
    if agg == "maxpool":
        kw.update(aggregator="maxpool", pool_dim=16, concat_self=True)
    model = GraphSAGE(**kw)
    params = model.init(jax.random.PRNGKey(1))
    repl = ServingEngine(model, graph, params, batch_buckets=(64,))
    shard = ServingEngine(model, graph, params, batch_buckets=(64,),
                          mesh=make_mesh({"graph": 8}))
    assert shard.table.shape[0] == 8  # shard-stacked, not [N, d]
    nodes = np.arange(graph.num_nodes)
    np.testing.assert_allclose(shard.logits(nodes), repl.logits(nodes),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(shard.predict(nodes), repl.predict(nodes))
    # refresh with new params keeps them in lockstep
    fresh = model.init(jax.random.PRNGKey(5))
    repl.refresh(fresh)
    shard.refresh(fresh)
    np.testing.assert_allclose(shard.logits(nodes[:64]), repl.logits(nodes[:64]),
                               rtol=1e-4, atol=1e-5)


def test_quantized_table_tier(graph, trained):
    """quantize_table=True: 4x smaller resident table; logits within the
    per-row quantization bound of the f32 tier and near-total prediction
    agreement (embeddings are well-separated after training)."""
    model, tr, st = trained
    f32 = ServingEngine(model, graph, st.params, batch_buckets=(64,))
    q8 = ServingEngine(model, graph, st.params, batch_buckets=(64,),
                       quantize_table=True)
    ms_f, ms_q = f32.memory_stats(), q8.memory_stats()
    assert ms_q["table_bytes_per_chip"] * 3 < ms_f["table_bytes_per_chip"]
    nodes = np.arange(graph.num_nodes)
    lf, lq = f32.logits(nodes), q8.logits(nodes)
    # Error bound: |rows_q - rows| <= scale/2 per element; through the head
    # that is scale/2 * sum|head| per logit.
    scale = np.asarray(q8.table.scale)
    head = np.abs(np.asarray(st.params.head)).sum(axis=0)  # [C]
    bound = (scale / 2) * head[None, :] + 1e-5
    assert np.all(np.abs(lq - lf) <= bound)
    agree = (q8.predict(nodes) == f32.predict(nodes)).mean()
    assert agree > 0.99
    # refresh keeps the table quantized
    q8.refresh(st.params)
    from graphsage_tpu.ops.quantize import is_quantized
    assert is_quantized(q8.table)


def test_quantized_sharded_table_tier(graph, trained):
    from graphsage_tpu.parallel.mesh import make_mesh

    model, _, st = trained
    mesh = make_mesh({"graph": 8})
    q_repl = ServingEngine(model, graph, st.params, batch_buckets=(64,),
                           quantize_table=True)
    q_shard = ServingEngine(model, graph, st.params, batch_buckets=(64,),
                            quantize_table=True, mesh=mesh)
    assert q_shard.table.shape[0] == 8
    nodes = np.arange(graph.num_nodes)
    # Same quantization applied to the same table values (halo refresh is
    # allclose to replicated; int8 rounding may differ only at ties).
    np.testing.assert_allclose(
        q_shard.logits(nodes), q_repl.logits(nodes), rtol=1e-3, atol=1e-3
    )
    assert (q_shard.predict(nodes) == q_repl.predict(nodes)).mean() > 0.99


def test_quantize_table_guard(graph, trained):
    model, _, st = trained
    with pytest.raises(ValueError, match="quantize_table"):
        ServingEngine(model, graph, st.params, mode="sampled",
                      quantize_table=True)


def test_serving_quantized_input_features(graph, trained):
    """A quantized INPUT graph serves through both modes (forward
    dequantizes); on pre-quantized features the table tier is exact."""
    from graphsage_tpu.data.graph import quantize_graph
    from graphsage_tpu.ops.quantize import dequantize, quantize_features

    model, _, st = trained
    dq = np.asarray(dequantize(quantize_features(np.asarray(graph.features))))
    dense = graph.replace(features=dq)
    quant = quantize_graph(dense)
    e_dense = ServingEngine(model, dense, st.params, batch_buckets=(64,))
    e_quant = ServingEngine(model, quant, st.params, batch_buckets=(64,))
    nodes = np.arange(128)
    np.testing.assert_allclose(e_quant.logits(nodes), e_dense.logits(nodes),
                               rtol=2e-4, atol=2e-5)
    s_dense = ServingEngine(model, dense, st.params, batch_buckets=(64,),
                            mode="sampled")
    s_quant = ServingEngine(model, quant, st.params, batch_buckets=(64,),
                            mode="sampled")
    np.testing.assert_allclose(s_quant.logits(nodes), s_dense.logits(nodes),
                               rtol=2e-4, atol=2e-5)


def test_memory_stats(graph, trained):
    from graphsage_tpu.parallel.mesh import make_mesh

    model, _, st = trained
    repl = ServingEngine(model, graph, st.params, batch_buckets=(32,))
    ms = repl.memory_stats()
    assert ms["table_bytes_per_chip"] == graph.num_nodes * model.hidden_dims[-1] * 4
    shard = ServingEngine(model, graph, st.params, batch_buckets=(32,),
                          mesh=make_mesh({"graph": 8}))
    ss = shard.memory_stats()
    assert ss["table_bytes_per_chip"] * 8 == ss["table_bytes_replicated_equiv"]
    assert "rows_exchanged_per_shard" in ss["refresh_comm"]


def test_sharded_tier_guards(graph, trained):
    from graphsage_tpu.parallel.mesh import make_mesh

    model, _, st = trained
    with pytest.raises(ValueError, match="table-mode"):
        ServingEngine(model, graph, st.params, mode="sampled",
                      mesh=make_mesh({"graph": 8}))


def test_guards(graph, trained):
    model, _, st = trained
    with pytest.raises(ValueError, match="mode"):
        ServingEngine(model, graph, st.params, mode="stream")
    with pytest.raises(ValueError, match="batch_buckets"):
        ServingEngine(model, graph, st.params, batch_buckets=())
    eng = ServingEngine(model, graph, st.params, batch_buckets=(8,))
    with pytest.raises(ValueError, match="empty"):
        eng.predict(np.zeros(0, np.int32))


def test_lstm_table_mode_and_unsupervised_embed_surface(graph):
    """Round-3 families through serving: an LSTM model's table refresh runs
    the ELL-scan full-graph forward (parity vs embed_full_graph + head),
    and an unsupervised (linear last layer) model's embed() is the
    embedding-serving surface — rows match embed_full_graph exactly."""
    import dataclasses

    import jax.numpy as jnp

    lstm_model = GraphSAGE(
        in_dim=graph.num_features, num_classes=graph.num_classes,
        hidden_dims=(16, 16), fanouts=(5, 5), aggregator="lstm", pool_dim=16,
        matmul_precision="highest",
    )
    params = lstm_model.init(jax.random.PRNGKey(4))
    eng = ServingEngine(lstm_model, graph, params, mode="table",
                        batch_buckets=(64,))
    nodes = np.arange(64)
    want = np.asarray(lstm_model.embed_full_graph(params, graph))[nodes]
    np.testing.assert_allclose(eng.embed(nodes), want, rtol=1e-5, atol=1e-6)
    logits_want = want @ np.asarray(params.head)
    np.testing.assert_allclose(eng.logits(nodes), logits_want,
                               rtol=1e-4, atol=1e-5)

    unsup_model = dataclasses.replace(lstm_model, aggregator="mean",
                                      pool_dim=None,
                                      final_activation="linear")
    u_params = unsup_model.init(jax.random.PRNGKey(5))
    u_eng = ServingEngine(unsup_model, graph, u_params, mode="table",
                          batch_buckets=(64,))
    u_want = np.asarray(unsup_model.embed_full_graph(u_params, graph))[nodes]
    assert (u_want < 0).any()  # the linear last layer really is linear
    np.testing.assert_allclose(u_eng.embed(nodes), u_want,
                               rtol=1e-5, atol=1e-6)
