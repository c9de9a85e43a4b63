"""Machine-level memory residency for the node-sharded trainers.

With a HOST graph (``build_graph(..., placement="host")``) the sharded
trainers must leave NO device buffer holding the full ``[N, F]`` feature
table — and for :class:`FullyShardedTrainer`, no full-adjacency buffer
either — after init, after training steps, and through a sampled eval.
Asserted against ``jax.live_arrays()`` (what is actually resident), not the
design math. Reference counterpart at scale: the resident ``nn.Embedding``
(reference graphsage/model.py:70-71) is exactly what sharding must avoid.
"""

import gc

import jax
import numpy as np
import pytest

from graphsage_tpu.data.graph import build_graph
from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.parallel.feature_store import (
    FullyShardedTrainer,
    ShardedFeatureTrainer,
)
from graphsage_tpu.parallel.mesh import make_mesh
from graphsage_tpu.train.config import TrainConfig
from graphsage_tpu.train.trainer import Trainer
from graphsage_tpu.utils.memory import live_device_bytes

N, F = 4096, 512  # full table 8 MiB f32 — dwarfs every legit per-shard buffer
FULL_TABLE_BYTES = N * F * 4


@pytest.fixture(scope="module")
def host_graph():
    g = power_law_graph(
        num_nodes=N, num_edges=4 * N, num_feats=F, num_classes=7, seed=3,
        homophily=0.8, placement="host",
    )
    assert g.on_host and isinstance(g.features, np.ndarray)
    return g


def _offending_buffers(graph, *, adjacency_too: bool):
    """Live single-device buffers shaped like a full graph leaf (or any
    2-D float buffer as large as the full table — catches transposed or
    re-laid-out copies that shape matching would miss)."""
    for _ in range(3):  # trainer<->jit closure cycles need multiple passes
        gc.collect()
    banned = {tuple(np.shape(graph.features))}
    if adjacency_too:
        banned |= {
            tuple(np.shape(graph.neighbors)),
            tuple(np.shape(graph.edge_dst)),
            tuple(np.shape(graph.edge_src)),
        }
    stats = live_device_bytes(min_bytes=1 << 16)
    out = []
    for b in stats["buffers"]:
        if tuple(b["shape"]) in banned:
            out.append(b)
        elif (
            len(b["shape"]) == 2
            and b["nbytes"] >= FULL_TABLE_BYTES
            and "float" in b["dtype"]
        ):
            out.append(b)
    return out


def test_host_graph_round_trip(host_graph):
    dev = host_graph.to_device()
    assert not dev.on_host
    np.testing.assert_array_equal(np.asarray(dev.features), host_graph.features)
    back = dev.to_host()
    assert back.on_host
    np.testing.assert_array_equal(back.edge_dst, host_graph.edge_dst)


def test_sharded_feature_trainer_no_full_table(host_graph):
    """Init -> steps -> sampled eval: the full [N, F] table never becomes
    device-resident (adjacency replication is this trainer's documented
    contract and is allowed)."""
    model = GraphSAGE(in_dim=F, num_classes=7, hidden_dims=(16, 16),
                      fanouts=(4, 4))
    cfg = TrainConfig(batch_size=64, num_steps=2, log_every=0,
                      eval_fanouts=(4, 4))
    mesh = make_mesh({"data": 8})
    tr = ShardedFeatureTrainer(model, host_graph, cfg, mesh)
    assert _offending_buffers(host_graph, adjacency_too=False) == []

    state = tr.init_state()
    it = tr.batches()
    for _ in range(2):
        state, loss = tr.step(state, next(it))
    assert np.isfinite(float(loss))
    preds = tr.predict(state, tr.val_nodes)
    assert preds.shape == (len(tr.val_nodes),)
    assert _offending_buffers(host_graph, adjacency_too=False) == []

    stats = tr.memory_stats()
    assert stats["measured_largest_buffer_bytes"] < FULL_TABLE_BYTES
    # The per-chip shard itself IS resident (sanity: measurement sees it).
    assert stats["measured_total_device_bytes"] >= stats["feature_bytes_per_chip"]


def test_fully_sharded_trainer_nothing_graph_sized(host_graph):
    """FullyShardedTrainer with a host graph: no full feature table AND no
    full adjacency buffer on any device — through init, training, and the
    DISTRIBUTED sampled eval (round-2 VERDICT items 1+2)."""
    model = GraphSAGE(in_dim=F, num_classes=7, hidden_dims=(16, 16),
                      fanouts=(4, 4))
    cfg = TrainConfig(batch_size=64, num_steps=2, log_every=0,
                      eval_fanouts=(4, 4))
    mesh = make_mesh({"data": 8})
    tr = FullyShardedTrainer(model, host_graph, cfg, mesh, capacity_slack=8.0)
    assert _offending_buffers(host_graph, adjacency_too=True) == []

    state = tr.init_state()
    it = tr.batches()
    for _ in range(2):
        state, loss = tr.step(state, next(it))
    assert np.isfinite(float(loss))
    preds = tr.predict(state, tr.val_nodes)
    assert preds.shape == (len(tr.val_nodes),)
    assert _offending_buffers(host_graph, adjacency_too=True) == []

    stats = tr.memory_stats()
    assert stats["measured_largest_buffer_bytes"] < FULL_TABLE_BYTES


def test_plain_trainer_places_host_graph(host_graph):
    """The single-chip trainer transparently device-places a host graph
    (its contract IS the resident table — reference model.py:70-71)."""
    model = GraphSAGE(in_dim=F, num_classes=7, hidden_dims=(8, 8),
                      fanouts=(3, 3))
    cfg = TrainConfig(batch_size=32, num_steps=1, log_every=0)
    tr = Trainer(model, host_graph, cfg)
    assert not tr.graph.on_host
    state = tr.init_state()
    state, loss = tr.step(state, next(tr.batches()))
    assert np.isfinite(float(loss))


def test_fully_sharded_eval_fallback_never_replicates(host_graph):
    """eval_fanouts=None on FullyShardedTrainer still routes through the
    distributed sampler (model fanouts) — never a replicated forward."""
    model = GraphSAGE(in_dim=F, num_classes=7, hidden_dims=(8, 8),
                      fanouts=(3, 3))
    cfg = TrainConfig(batch_size=64, num_steps=1, log_every=0,
                      eval_fanouts=None)
    mesh = make_mesh({"data": 8})
    tr = FullyShardedTrainer(model, host_graph, cfg, mesh, capacity_slack=8.0)
    state = tr.init_state()
    preds = tr.predict(state, np.arange(40))
    assert preds.shape == (40,)
    assert _offending_buffers(host_graph, adjacency_too=True) == []


def test_unsupervised_fully_sharded_nothing_graph_sized(host_graph):
    """UnsupervisedFullyShardedTrainer: the distributed-walk unsupervised
    tier keeps the residency claim too — no full feature table and no full
    adjacency buffer through init, training (walks + negatives + frontier
    all inside shard_map), and the distributed-embedding linear probe."""
    from graphsage_tpu.train.unsupervised import (
        UnsupervisedFullyShardedTrainer,
    )

    model = GraphSAGE(in_dim=F, num_classes=7, hidden_dims=(16, 16),
                      fanouts=(4, 4), final_activation="linear")
    cfg = TrainConfig(batch_size=64, num_steps=2, log_every=0,
                      objective="unsupervised", walk_length=2,
                      num_negatives=4, optimizer="adam", learning_rate=0.01,
                      eval_fanouts=(4, 4))
    mesh = make_mesh({"data": 8})
    tr = UnsupervisedFullyShardedTrainer(model, host_graph, cfg, mesh,
                                         capacity_slack=8.0)
    assert _offending_buffers(host_graph, adjacency_too=True) == []

    state = tr.init_state()
    it = tr.batches()
    for _ in range(2):
        state, loss = tr.step(state, next(it))
    assert np.isfinite(float(loss))
    preds = tr.predict(state, tr.val_nodes)
    assert preds.shape == (len(tr.val_nodes),)
    assert _offending_buffers(host_graph, adjacency_too=True) == []
