"""Pod-scale ingestion: lazy loaders + loader-built feature stores.

The eager path costs every host ``2·N·F`` RAM (full table + the stacked
copy inside shard_features) before anything is placed. The lazy path —
``load_*_lazy`` (byte-offset parse, zero-strided feature descriptor) +
``shard_features_from_loader`` (shards built per ADDRESSABLE device) —
never materializes the full table on any host.
Pinned here: byte-for-byte agreement with the eager loaders, store
equality with shard_features, trainer lockstep through the loader store,
and the guard that the (unavailable) full-graph eval fails loudly instead
of silently reading the zero descriptor.
"""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphsage_tpu.data.loaders import (
    load_cora,
    load_cora_lazy,
    load_pubmed,
    load_pubmed_lazy,
)
from graphsage_tpu.data.synthetic import synth_cora_files, synth_pubmed_files
from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.parallel.feature_store import (
    ShardedFeatureTrainer,
    shard_features,
    shard_features_from_loader,
)
from graphsage_tpu.parallel.mesh import make_mesh
from graphsage_tpu.train.config import TrainConfig


@pytest.fixture(scope="module")
def cora_root():
    return synth_cora_files(tempfile.mkdtemp(), seed=11)


def test_lazy_cora_matches_eager(cora_root):
    eager = load_cora(cora_root, engine="python", placement="host")
    lazy, row_loader = load_cora_lazy(cora_root)
    assert lazy.num_nodes == eager.num_nodes
    assert lazy.num_features == eager.num_features
    np.testing.assert_array_equal(np.asarray(lazy.labels),
                                  np.asarray(eager.labels))
    for leaf in ("neighbors", "degrees", "indptr", "edge_src", "edge_dst"):
        np.testing.assert_array_equal(
            np.asarray(getattr(lazy, leaf)), np.asarray(getattr(eager, leaf))
        )
    # The descriptor really is zero-strided — no [N, F] array exists.
    assert lazy.features.strides[0] == 0
    # Row loader reproduces the eager features, whole and in slices.
    n = eager.num_nodes
    np.testing.assert_array_equal(row_loader(0, n), np.asarray(eager.features))
    np.testing.assert_array_equal(
        row_loader(100, 164), np.asarray(eager.features)[100:164]
    )


def test_lazy_pubmed_matches_eager():
    root = synth_pubmed_files(tempfile.mkdtemp(), seed=12)
    eager = load_pubmed(root, engine="python", placement="host")
    lazy, row_loader = load_pubmed_lazy(root)
    assert lazy.num_nodes == eager.num_nodes
    np.testing.assert_array_equal(np.asarray(lazy.labels),
                                  np.asarray(eager.labels))
    np.testing.assert_array_equal(np.asarray(lazy.edge_dst),
                                  np.asarray(eager.edge_dst))
    n = eager.num_nodes
    np.testing.assert_array_equal(row_loader(0, n), np.asarray(eager.features))
    np.testing.assert_array_equal(
        row_loader(7, 31), np.asarray(eager.features)[7:31]
    )


def test_shard_features_from_loader_matches_shard_features():
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(5)
    feats = rng.normal(size=(100, 12)).astype(np.float32)
    mesh = make_mesh({"data": 8})
    sharding = NamedSharding(mesh, P("data"))
    eager = shard_features(feats, 8, sharding=sharding)
    calls = []

    def loader(lo, hi):
        calls.append((lo, hi))
        return feats[lo:hi]

    lazy = shard_features_from_loader(loader, 100, 12, 8, sharding)
    assert lazy.rows_per_shard == eager.rows_per_shard
    np.testing.assert_array_equal(np.asarray(lazy.shards),
                                  np.asarray(eager.shards))
    # Every request stayed inside real rows (padding never hits the loader).
    assert all(0 <= lo < hi <= 100 for lo, hi in calls)


def test_trainer_from_loader_store_lockstep_and_guard(cora_root):
    from jax.sharding import NamedSharding, PartitionSpec as P

    eager_graph = load_cora(cora_root, engine="python", placement="host")
    lazy_graph, row_loader = load_cora_lazy(cora_root)
    model = GraphSAGE(
        in_dim=eager_graph.num_features, num_classes=eager_graph.num_classes,
        hidden_dims=(16, 16), fanouts=(5, 5), gather_impl="take",
        matmul_precision="highest",
    )
    cfg = TrainConfig(batch_size=32, num_steps=3, learning_rate=0.5,
                      log_every=0, eval_fanouts=(5, 5))
    mesh = make_mesh({"data": 8})
    store = shard_features_from_loader(
        row_loader, lazy_graph.num_nodes, lazy_graph.num_features, 8,
        NamedSharding(mesh, P("data")),
    )
    lazy_tr = ShardedFeatureTrainer(model, lazy_graph, cfg, mesh,
                                    feature_store=store)
    eager_tr = ShardedFeatureTrainer(model, eager_graph, cfg, mesh)
    s1, s2 = eager_tr.init_state(), lazy_tr.init_state()
    it1, it2 = eager_tr.batches(), lazy_tr.batches()
    for _ in range(cfg.num_steps):
        s1, l1 = eager_tr.step(s1, next(it1))
        s2, l2 = lazy_tr.step(s2, next(it2))
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    # Sampled eval through the sharded gather works...
    preds = lazy_tr.predict(s2, lazy_tr.val_nodes)
    assert preds.shape == (len(lazy_tr.val_nodes),)
    np.testing.assert_array_equal(
        preds, eager_tr.predict(s1, eager_tr.val_nodes)
    )
    # ...and the full-graph fallback is unreachable by construction: a
    # store-backed trainer with eval_fanouts=None fails FAST (see
    # test_feature_store_requires_eval_fanouts).
    import dataclasses

    cfg_full = dataclasses.replace(cfg, eval_fanouts=None)
    with pytest.raises(ValueError, match="eval_fanouts"):
        ShardedFeatureTrainer(model, lazy_graph, cfg_full, mesh,
                              feature_store=store)


def test_store_shape_mismatches_rejected(cora_root):
    from jax.sharding import NamedSharding, PartitionSpec as P

    lazy_graph, row_loader = load_cora_lazy(cora_root)
    mesh = make_mesh({"data": 8})
    model = GraphSAGE(in_dim=lazy_graph.num_features,
                      num_classes=lazy_graph.num_classes,
                      hidden_dims=(8, 8), fanouts=(4, 4))
    cfg = TrainConfig(batch_size=32, num_steps=1, log_every=0,
                      eval_fanouts=(4, 4))
    wrong_nodes = shard_features_from_loader(
        lambda lo, hi: np.zeros((hi - lo, lazy_graph.num_features), np.float32),
        lazy_graph.num_nodes - 1, lazy_graph.num_features, 8,
        NamedSharding(mesh, P("data")),
    )
    with pytest.raises(ValueError, match="nodes"):
        ShardedFeatureTrainer(model, lazy_graph, cfg, mesh,
                              feature_store=wrong_nodes)


def test_native_row_loaders_match_python(cora_root):
    from graphsage_tpu.data import native

    if not (native.available()
            and hasattr(native.load_library(), "gsl_cora_feature_rows")):
        pytest.skip("native library unavailable")
    _, py_rows = load_cora_lazy(cora_root, engine="python")
    _, nat_rows = load_cora_lazy(cora_root, engine="native")
    np.testing.assert_array_equal(nat_rows(0, 200), py_rows(0, 200))
    np.testing.assert_array_equal(nat_rows(1300, 1400), py_rows(1300, 1400))

    proot = synth_pubmed_files(tempfile.mkdtemp(), seed=13)
    _, py_p = load_pubmed_lazy(proot, engine="python")
    _, nat_p = load_pubmed_lazy(proot, engine="native")
    np.testing.assert_array_equal(nat_p(0, 64), py_p(0, 64))
    np.testing.assert_array_equal(nat_p(33, 97), py_p(33, 97))


def test_quantized_loader_store_matches_eager_quantized():
    """quantize=True on the loader path == shard_features(quantize_features
    (full table)) bit-for-bit — per-row scales are owner-local, so int8
    composes with lazy ingestion without any host ever holding the f32
    table."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from graphsage_tpu.ops.quantize import quantize_features

    rng = np.random.default_rng(9)
    feats = (rng.normal(size=(100, 12)) * 3.7).astype(np.float32)
    mesh = make_mesh({"data": 8})
    sharding = NamedSharding(mesh, P("data"))
    eager = shard_features(quantize_features(feats), 8, sharding=sharding)
    lazy = shard_features_from_loader(
        lambda lo, hi: feats[lo:hi], 100, 12, 8, sharding, quantize=True
    )
    np.testing.assert_array_equal(np.asarray(lazy.shards.q),
                                  np.asarray(eager.shards.q))
    np.testing.assert_array_equal(np.asarray(lazy.shards.scale),
                                  np.asarray(eager.shards.scale))
    assert lazy.shards.q.dtype == jnp.int8


def test_lazy_descriptor_never_silently_consumed(cora_root):
    """Every eager consumer of a lazy graph's zero descriptor must raise —
    silently training/serving on N*F zeros is the one failure mode the lazy
    path must not have (review finding)."""
    from graphsage_tpu.data.graph import quantize_graph
    from graphsage_tpu.train.trainer import Trainer

    lazy_graph, _ = load_cora_lazy(cora_root)
    model = GraphSAGE(in_dim=lazy_graph.num_features,
                      num_classes=lazy_graph.num_classes,
                      hidden_dims=(8, 8), fanouts=(4, 4))
    cfg = TrainConfig(batch_size=32, num_steps=1, log_every=0,
                      eval_fanouts=(4, 4))
    mesh = make_mesh({"data": 8})
    with pytest.raises(ValueError, match="LAZY descriptor"):
        ShardedFeatureTrainer(model, lazy_graph, cfg, mesh)  # store forgotten
    with pytest.raises(ValueError, match="LAZY descriptor"):
        lazy_graph.to_device()
    with pytest.raises(ValueError, match="LAZY descriptor"):
        Trainer(model, lazy_graph, cfg)  # would device-place the zeros
    with pytest.raises(ValueError, match="LAZY descriptor"):
        quantize_graph(lazy_graph)
    with pytest.raises(ValueError, match="LAZY descriptor"):
        shard_features(lazy_graph.features, 8)


def test_feature_store_requires_eval_fanouts(cora_root):
    """feature_store + eval_fanouts=None fails at CONSTRUCTION — run()
    unconditionally ends in evaluate(), and raising only there would
    discard the whole training run's work (review finding)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    lazy_graph, row_loader = load_cora_lazy(cora_root)
    mesh = make_mesh({"data": 8})
    store = shard_features_from_loader(
        row_loader, lazy_graph.num_nodes, lazy_graph.num_features, 8,
        NamedSharding(mesh, P("data")),
    )
    model = GraphSAGE(in_dim=lazy_graph.num_features,
                      num_classes=lazy_graph.num_classes,
                      hidden_dims=(8, 8), fanouts=(4, 4))
    with pytest.raises(ValueError, match="eval_fanouts"):
        ShardedFeatureTrainer(
            model, lazy_graph,
            TrainConfig(batch_size=32, num_steps=1, log_every=0),
            mesh, feature_store=store,
        )


def test_replicated_axis_loads_each_block_once():
    """A {data, model} mesh replicates each shard across the model axis;
    the loader must still be invoked once per distinct block, not once per
    replica device (review finding: duplicated disk I/O at pod scale)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    feats = np.arange(100 * 12, dtype=np.float32).reshape(100, 12)
    mesh = make_mesh({"data": 4, "model": 2})
    calls = []

    def loader(lo, hi):
        calls.append((lo, hi))
        return feats[lo:hi]

    store = shard_features_from_loader(
        loader, 100, 12, 4, NamedSharding(mesh, P("data"))
    )
    assert len(calls) == len(set(calls)) == 4, calls
    eager = shard_features(feats, 4)
    np.testing.assert_array_equal(np.asarray(store.shards),
                                  np.asarray(eager.shards))


def test_halo_partition_rejects_lazy_descriptor(cora_root):
    from graphsage_tpu.parallel.halo import build_node_partition

    lazy_graph, _ = load_cora_lazy(cora_root)
    with pytest.raises(ValueError, match="LAZY descriptor"):
        build_node_partition(lazy_graph, 8)
