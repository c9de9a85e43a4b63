"""LSTM aggregator — the third member of the GraphSAGE paper's aggregator
family (§3.3; the reference ships only the mean, reference
graphsage/aggregators.py:30-65).

Pins: the masked scan against a plain numpy LSTM oracle, padding-position
invariance, the zero-aggregate guard for isolated nodes (quirk Q4),
sampled == full-graph parity at covering fanouts (the Floyd sampler takes
identity slots below-fanout, i.e. ELL order — ops/sampling.py), end-to-end
learning, node-sharded feature-store parity, and the documented rejections
(layer0='full', halo / edge-partitioned full-graph, hub-capped ELL).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphsage_tpu.data.graph import build_graph
from graphsage_tpu.data.synthetic import synthetic_cora_graph
from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.models.layers import init_sage_layer, masked_lstm
from graphsage_tpu.train.config import TrainConfig
from graphsage_tpu.train.trainer import Trainer


def _np_lstm(wx, wh, b, seq, mask):
    """Plain-loop oracle: gate order i, f, g, o; invalid steps carry through."""
    H = wh.shape[0]
    h = np.zeros(H, np.float64)
    c = np.zeros(H, np.float64)
    sig = lambda x: 1.0 / (1.0 + np.exp(-x))
    for t in range(seq.shape[0]):
        if not mask[t]:
            continue
        gates = seq[t] @ wx + h @ wh + b
        i, f, g, o = np.split(gates, 4)
        c = sig(f) * c + sig(i) * np.tanh(g)
        h = sig(o) * np.tanh(c)
    return h


def test_masked_lstm_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    B, k, d, H = 7, 5, 6, 4
    wx = rng.normal(size=(d, 4 * H)).astype(np.float32) * 0.3
    wh = rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.3
    b = rng.normal(size=(4 * H,)).astype(np.float32) * 0.1
    seq = rng.normal(size=(B, k, d)).astype(np.float32)
    # Prefix masks of every length, including 0 (isolated node).
    lengths = np.array([0, 1, 2, 3, 4, 5, 3])
    mask = np.arange(k)[None, :] < lengths[:, None]
    got = np.asarray(
        masked_lstm(
            jnp.asarray(wx), jnp.asarray(wh), jnp.asarray(b),
            jnp.asarray(seq), jnp.asarray(mask), precision="highest",
        )
    )
    want = np.stack([_np_lstm(wx, wh, b, seq[i], mask[i]) for i in range(B)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # Empty row -> exactly zero (the masked mean/max convention, quirk Q4).
    assert (got[0] == 0).all()


def test_masked_lstm_padding_position_invariance():
    """The result depends on the ORDER of valid slots, never on WHERE the
    padding sits (the carry-through makes interleaved padding exact)."""
    rng = np.random.default_rng(1)
    k, d, H = 6, 5, 3
    wx = rng.normal(size=(d, 4 * H)).astype(np.float32) * 0.3
    wh = rng.normal(size=(H, 4 * H)).astype(np.float32) * 0.3
    b = np.zeros(4 * H, np.float32)
    valid = rng.normal(size=(3, d)).astype(np.float32)
    pad = rng.normal(size=(3, d)).astype(np.float32) * 100  # must be ignored
    # Same 3 valid rows in the same order; padding at tail vs interleaved.
    seq_tail = np.concatenate([valid, pad], axis=0)[None]
    mask_tail = np.array([[1, 1, 1, 0, 0, 0]], bool)
    seq_mid = np.stack(
        [pad[0], valid[0], pad[1], valid[1], valid[2], pad[2]]
    )[None]
    mask_mid = np.array([[0, 1, 0, 1, 1, 0]], bool)
    args = (jnp.asarray(wx), jnp.asarray(wh), jnp.asarray(b))
    a = masked_lstm(*args, jnp.asarray(seq_tail), jnp.asarray(mask_tail))
    bres = masked_lstm(*args, jnp.asarray(seq_mid), jnp.asarray(mask_mid))
    np.testing.assert_allclose(np.asarray(a), np.asarray(bres), rtol=1e-6)


@pytest.mark.parametrize("mode", ["plain", "concat_self", "self_loop"])
def test_lstm_sampled_matches_full_graph_at_covering_fanouts(tiny_graph, mode):
    g = tiny_graph
    kw = dict(
        in_dim=g.num_features, num_classes=g.num_classes,
        hidden_dims=(8, 8), fanouts=(16, 16), aggregator="lstm", pool_dim=8,
        matmul_precision="highest",
    )
    if mode == "concat_self":
        kw["concat_self"] = True
    elif mode == "self_loop":
        kw["self_loop"] = True
    model = GraphSAGE(**kw)
    params = model.init(jax.random.PRNGKey(1))
    seeds = jnp.arange(g.num_nodes, dtype=jnp.int32)
    frontier = model.sample(jax.random.PRNGKey(2), g, seeds)
    got = np.asarray(model.forward(params, g.features, frontier))
    want = np.asarray(model.forward_full_graph(params, g))
    assert np.isfinite(want).all()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # The isolated node (5) aggregates to exactly zero, not NaN (quirk Q4).
    assert np.isfinite(want[5]).all()


def test_lstm_training_learns():
    g = synthetic_cora_graph(num_nodes=300, num_feats=32, num_edges=900, seed=0)
    model = GraphSAGE(
        in_dim=32, num_classes=g.num_classes, hidden_dims=(32, 32),
        fanouts=(5, 5), aggregator="lstm", pool_dim=32, concat_self=True,
    )
    cfg = TrainConfig(
        batch_size=64, num_steps=60, optimizer="adam", learning_rate=0.01,
        test_size=40, val_size=40, log_every=0,
    )
    res = Trainer(model, g, cfg).run(log=None)
    assert res["losses"][-1] < res["losses"][0] * 0.5
    assert res["val_micro_f1"] > 0.8


def test_lstm_sharded_feature_store_parity():
    from graphsage_tpu.parallel.feature_store import ShardedFeatureTrainer
    from graphsage_tpu.parallel.mesh import make_mesh

    g = synthetic_cora_graph(num_nodes=200, num_feats=16, num_edges=600, seed=1)
    model = GraphSAGE(
        in_dim=16, num_classes=g.num_classes, hidden_dims=(8, 8),
        fanouts=(4, 4), aggregator="lstm", pool_dim=8, concat_self=True,
        gather_impl="take", matmul_precision="highest",
    )
    cfg = TrainConfig(
        batch_size=32, num_steps=3, learning_rate=0.5,
        test_size=40, val_size=40, log_every=0,
    )
    single = Trainer(model, g, cfg)
    sharded = ShardedFeatureTrainer(model, g, cfg, make_mesh({"data": 8}))
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


def test_lstm_dp_sharded_trainer_parity():
    from graphsage_tpu.parallel.distributed import ShardedTrainer
    from graphsage_tpu.parallel.mesh import make_mesh

    g = synthetic_cora_graph(num_nodes=200, num_feats=16, num_edges=600, seed=2)
    model = GraphSAGE(
        in_dim=16, num_classes=g.num_classes, hidden_dims=(8, 8),
        fanouts=(4, 4), aggregator="lstm", pool_dim=8,
        gather_impl="take", matmul_precision="highest",
    )
    cfg = TrainConfig(
        batch_size=32, num_steps=3, learning_rate=0.5,
        test_size=40, val_size=40, log_every=0,
    )
    single = Trainer(model, g, cfg)
    dp = ShardedTrainer(model, g, cfg, make_mesh({"data": 8}))
    s1, s2 = single.init_state(), dp.init_state()
    it1, it2 = single.batches(), dp.batches()
    for _ in range(cfg.num_steps):
        s1, l1 = single.step(s1, next(it1))
        s2, l2 = dp.step(s2, next(it2))
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------- rejections
def test_lstm_rejects_layer0_full():
    with pytest.raises(ValueError, match="mean and maxpool"):
        GraphSAGE(in_dim=4, num_classes=2, hidden_dims=(4, 4),
                  fanouts=(4, 4), aggregator="lstm", layer0="full")


def test_lstm_rejects_hub_capped_full_graph(tiny_graph):
    g = dataclasses.replace(tiny_graph, ell_covers_all=False)
    model = GraphSAGE(in_dim=g.num_features, num_classes=g.num_classes,
                      hidden_dims=(4,), fanouts=(4,), aggregator="lstm")
    params = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="hub-capped"):
        model.forward_full_graph(params, g)


def test_lstm_rejects_halo_full_graph_trainer(tiny_graph):
    from graphsage_tpu.parallel.mesh import make_mesh
    from graphsage_tpu.train.full_graph import FullGraphTrainer

    model = GraphSAGE(in_dim=tiny_graph.num_features, num_classes=2,
                      hidden_dims=(4,), fanouts=(4,), aggregator="lstm")
    with pytest.raises(ValueError, match="sampled trainers"):
        FullGraphTrainer(model, tiny_graph, TrainConfig(test_size=2, val_size=2),
                         mesh=make_mesh({"graph": 8}))


def test_masked_lstm_matches_torch_lstmcell():
    """Cross-framework oracle: torch.nn.LSTMCell shares the i,f,g,o gate
    order; our [in, 4H] kernels are its [4H, in] transposed, our single
    bias is its b_ih + b_hh. Full-length sequences (torch has no mask)."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(7)
    B, k, d, H = 5, 6, 8, 4
    cell = torch.nn.LSTMCell(d, H)
    seq = rng.normal(size=(B, k, d)).astype(np.float32)
    with torch.no_grad():
        h = torch.zeros(B, H)
        c = torch.zeros(B, H)
        for t in range(k):
            h, c = cell(torch.from_numpy(seq[:, t]), (h, c))
    want = h.numpy()
    wx = cell.weight_ih.detach().numpy().T  # [d, 4H]
    wh = cell.weight_hh.detach().numpy().T  # [H, 4H]
    b = (cell.bias_ih + cell.bias_hh).detach().numpy()
    got = np.asarray(
        masked_lstm(
            jnp.asarray(wx), jnp.asarray(wh), jnp.asarray(b),
            jnp.asarray(seq), jnp.ones((B, k), bool), precision="highest",
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_lstm_checkpoint_round_trip(tmp_path):
    """The optional lstm leaves survive the npz save/restore (None fields
    must stay None, arrays must come back exact)."""
    from graphsage_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    model = GraphSAGE(in_dim=6, num_classes=3, hidden_dims=(4, 4),
                      fanouts=(3, 3), aggregator="lstm", pool_dim=4)
    params = model.init(jax.random.PRNGKey(0))
    path = save_checkpoint(tmp_path / "lstm.npz", params)
    template = model.init(jax.random.PRNGKey(1))
    restored = restore_checkpoint(path, template)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params, restored,
    )
    assert restored.layers[0].pool_weight is None
    assert restored.layers[0].lstm_wx is not None
