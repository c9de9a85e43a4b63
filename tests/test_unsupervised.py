"""Unsupervised objective: walks, negative table, loss, probe, trainer e2e.

The reference has no unsupervised mode (its loss is supervised cross-entropy,
reference graphsage/model.py:35-37), so there is no parity oracle here — these
tests pin the GraphSAGE-paper semantics directly: walks stay on real edges,
negatives follow degree^0.75, the context loss separates a homophilous graph
well enough for a linear probe to beat both chance and an untrained encoder.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphsage_tpu.data.graph import build_graph
from graphsage_tpu.data.synthetic import synthetic_cora_graph
from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.models.unsupervised import linear_probe_predict, unsupervised_loss
from graphsage_tpu.ops.walks import (
    negative_cdf,
    positive_pairs,
    random_walk,
    sample_from_cdf,
)
from graphsage_tpu.train.config import TrainConfig
from graphsage_tpu.train.unsupervised import UnsupervisedTrainer


# --------------------------------------------------------------------- walks
def test_random_walk_stays_on_edges(tiny_graph):
    g = tiny_graph
    starts = jnp.arange(g.num_nodes, dtype=jnp.int32)
    walks, valid = jax.jit(lambda k: random_walk(k, g, starts, 4))(
        jax.random.PRNGKey(0)
    )
    walks, valid = np.asarray(walks), np.asarray(valid)
    assert walks.shape == (g.num_nodes, 5) and valid.shape == walks.shape
    neigh = {
        v: set(np.asarray(g.neighbors)[v, : int(np.asarray(g.degrees)[v])].tolist())
        for v in range(g.num_nodes)
    }
    for v in range(g.num_nodes):
        assert walks[v, 0] == v and valid[v, 0]
        for t in range(1, 5):
            if valid[v, t]:
                assert walks[v, t] in neigh[walks[v, t - 1]]
            else:
                # dead walk: stays put, never revives
                assert walks[v, t] == walks[v, t - 1]
                assert not valid[v, t:].any()


def test_random_walk_isolated_node(tiny_graph):
    walks, valid = random_walk(
        jax.random.PRNGKey(1), tiny_graph, jnp.asarray([5], jnp.int32), 3
    )
    assert np.asarray(walks).tolist() == [[5, 5, 5, 5]]
    assert np.asarray(valid).tolist() == [[True, False, False, False]]


def test_positive_pairs_valid_and_masked(tiny_graph):
    g = tiny_graph
    seeds = jnp.arange(g.num_nodes, dtype=jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(2), 200)
    pairs = jax.vmap(lambda k: positive_pairs(k, g, seeds, 3))(keys)
    pos, mask = np.asarray(pairs[0]), np.asarray(pairs[1])
    # isolated node 5: always itself, always masked out
    assert (pos[:, 5] == 5).all() and not mask[:, 5].any()
    # connected nodes always find a positive, and it is a reachable node
    assert mask[:, :5].all()
    reach = {0: {1, 2, 3, 4}, 1: {0, 2, 3, 4}, 2: {0, 1, 3, 4}, 3: {0, 1, 2, 4}, 4: {0, 1, 2, 3}}
    for v in range(5):
        assert set(np.unique(pos[:, v]).tolist()) <= reach[v] | {v}


def test_negative_table_matches_degree_power():
    # star + chain: degrees far from uniform
    edges = np.array([[0, i] for i in range(1, 8)] + [[1, 2], [2, 3]])
    g = build_graph(
        np.zeros((8, 2), np.float32), np.zeros(8), edges, num_classes=1
    )
    deg = np.asarray(g.degrees, np.float64)
    expect = deg**0.75 / (deg**0.75).sum()
    cdf = jnp.asarray(negative_cdf(np.asarray(g.degrees)))
    draws = 60_000
    ids = np.asarray(
        jax.jit(lambda k: sample_from_cdf(k, cdf, (draws,)))(jax.random.PRNGKey(7))
    )
    freq = np.bincount(ids, minlength=8) / draws
    np.testing.assert_allclose(freq, expect, atol=0.01)


def test_negative_table_edgeless_uniform():
    cdf = negative_cdf(np.zeros(5, np.int32))
    ids = np.asarray(sample_from_cdf(jax.random.PRNGKey(0), jnp.asarray(cdf), (5000,)))
    freq = np.bincount(ids, minlength=5) / 5000
    np.testing.assert_allclose(freq, 0.2, atol=0.03)


# ---------------------------------------------------------------------- loss
def _small_setup(seed=0):
    g = synthetic_cora_graph(num_nodes=300, num_feats=64, num_edges=900, seed=seed)
    model = GraphSAGE(
        in_dim=64, num_classes=g.num_classes, hidden_dims=(32, 32),
        fanouts=(5, 5), final_activation="linear",
    )
    return g, model


def test_unsupervised_loss_finite_and_jittable():
    g, model = _small_setup()
    params = model.init(jax.random.PRNGKey(0))
    cdf = jnp.asarray(negative_cdf(np.asarray(g.degrees)))
    seeds = jnp.arange(32, dtype=jnp.int32)
    loss_fn = jax.jit(
        lambda p, k: unsupervised_loss(
            model, p, g, k, seeds, cdf, walk_length=3, num_negatives=5
        )
    )
    loss = loss_fn(params, jax.random.PRNGKey(1))
    # Normalized embeddings bound every per-seed term: each of the 1+Q
    # sigmoid terms lies in [-log sig(1), -log sig(-1)] = [0.313, 1.313].
    assert 0.3 * 6 < float(loss) < 1.32 * 6
    grads = jax.grad(lambda p: loss_fn(p, jax.random.PRNGKey(2)))(params)
    assert all(
        np.isfinite(np.asarray(leaf)).all()
        for leaf in jax.tree_util.tree_leaves(grads)
    )


def test_unsupervised_training_learns_graph_geometry():
    g, model = _small_setup()
    cfg = TrainConfig(
        batch_size=64, num_steps=120, optimizer="adam", learning_rate=0.01,
        objective="unsupervised", walk_length=3, num_negatives=8,
        test_size=60, val_size=60, log_every=0, steps_per_dispatch=20,
    )
    trainer = UnsupervisedTrainer(model, g, cfg)
    state0 = trainer.init_state()
    result = trainer.run(log=None)
    losses = result["losses"]
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) - 0.3
    # No zero-collapse: the normalized objective must NOT pin at the
    # all-zero fixed point value (1+Q)*log2 with dead embeddings.
    emb = np.asarray(trainer._jit_embed_full(result["state"].params, trainer.graph))
    norms = np.linalg.norm(emb, axis=1)
    assert norms.mean() > 0.05
    # The objective's geometry: edge endpoints more similar than random
    # pairs, by a clear margin, on the unit sphere the loss optimizes.
    z = emb / (norms[:, None] + 1e-8)
    src = np.asarray(g.edge_src)[np.asarray(g.edge_mask)]
    dst = np.asarray(g.edge_dst)[np.asarray(g.edge_mask)]
    pos_cos = (z[src] * z[dst]).sum(-1).mean()
    rng = np.random.default_rng(0)
    ri, rj = rng.integers(0, g.num_nodes, 4000), rng.integers(0, g.num_nodes, 4000)
    rand_cos = (z[ri] * z[rj]).sum(-1).mean()
    assert pos_cos > rand_cos + 0.2
    # Linear probe on the frozen embeddings solves the labels well above
    # chance (labels correlate with communities via homophilous edges).
    f1 = result["val_micro_f1"]
    assert f1 > 1.0 / g.num_classes + 0.2
    # labels never reach the training gradient: the head (unused by the
    # objective) must be bit-identical to its init.
    np.testing.assert_array_equal(
        np.asarray(result["state"].params.head), np.asarray(state0.params.head)
    )


def test_run_preset_dispatches_unsupervised(synth_cora_root):
    from graphsage_tpu.train.experiments import run_preset

    result = run_preset(
        "cora_unsup", data_root=synth_cora_root, log=None,
        overrides={"num_steps": 4, "batch_size": 32, "steps_per_dispatch": 1,
                   "test_size": 100, "val_size": 100},
    )
    assert len(result["losses"]) == 4
    assert np.isfinite(result["val_micro_f1"])


def test_unsupervised_rejects_distributed_modes(synth_cora_root):
    from graphsage_tpu.train.experiments import run_preset

    with pytest.raises(ValueError, match="unsupervised"):
        run_preset(
            "cora_unsup", data_root=synth_cora_root, log=None,
            mode="full-graph",
            overrides={"test_size": 100, "val_size": 100},
        )


def test_unsupervised_rejects_relu_model():
    g, model = _small_setup()
    relu_model = GraphSAGE(
        in_dim=64, num_classes=g.num_classes, hidden_dims=(32, 32), fanouts=(5, 5)
    )
    with pytest.raises(ValueError, match="final_activation"):
        UnsupervisedTrainer(relu_model, g, TrainConfig(objective="unsupervised"))


def test_linear_final_activation_mode_consistency(tiny_graph):
    """sampled at covering fanouts == full-graph, with the linear last layer
    (the relu version of this identity is pinned in test_mode_matrix)."""
    g = tiny_graph
    model = GraphSAGE(
        in_dim=4, num_classes=2, hidden_dims=(8, 8), fanouts=(None, None),
        final_activation="linear", matmul_precision="highest",
    )
    params = model.init(jax.random.PRNGKey(0))
    emb_full = model.embed_full_graph(params, g)
    frontier = model.sample(jax.random.PRNGKey(1), g, jnp.arange(6, dtype=jnp.int32))
    emb_sampled = model.forward(
        params, g.features, frontier, return_embeddings=True, graph=g
    )
    np.testing.assert_allclose(
        np.asarray(emb_sampled), np.asarray(emb_full), rtol=1e-5, atol=1e-5
    )
    # the flag actually bites: a linear last layer can go negative
    assert (np.asarray(emb_full) < 0).any()


# ------------------------------------------------------------------- sharded
@pytest.mark.parametrize("gather_mode", ["dense", "compact"])
def test_unsupervised_sharded_matches_single_chip(gather_mode):
    import dataclasses

    from graphsage_tpu.parallel.mesh import make_mesh
    from graphsage_tpu.train.trainer import Trainer as _  # noqa: F401
    from graphsage_tpu.train.unsupervised import UnsupervisedShardedTrainer

    g, model = _small_setup()
    model = dataclasses.replace(
        model, gather_impl="take", matmul_precision="highest"
    )
    cfg = TrainConfig(
        batch_size=32, num_steps=4, optimizer="adam", learning_rate=0.01,
        objective="unsupervised", walk_length=3, num_negatives=6,
        test_size=40, val_size=40, log_every=0,
    )
    single = UnsupervisedTrainer(model, g, cfg)
    sharded = UnsupervisedShardedTrainer(
        model, g, cfg, make_mesh({"data": 8}), gather_mode=gather_mode,
        capacity_slack=4.0,
    )
    s1, s2 = single.init_state(), sharded.init_state()
    it1, it2 = single.batches(), sharded.batches()
    for _step in range(cfg.num_steps):
        s1, l1 = single.step(s1, next(it1))
        s2, l2 = sharded.step(s2, next(it2))
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        s1.params, s2.params,
    )


def test_unsupervised_sharded_run_block_dispatch_and_probe():
    from graphsage_tpu.parallel.mesh import make_mesh
    from graphsage_tpu.train.unsupervised import UnsupervisedShardedTrainer

    g, model = _small_setup()
    cfg = TrainConfig(
        batch_size=32, num_steps=8, steps_per_dispatch=4, optimizer="adam",
        learning_rate=0.01, objective="unsupervised", walk_length=3,
        num_negatives=6, test_size=40, val_size=40, log_every=0,
    )
    trainer = UnsupervisedShardedTrainer(
        model, g.to_host(), cfg, make_mesh({"data": 8})
    )
    result = trainer.run(log=None)
    assert len(result["losses"]) == 8
    assert np.isfinite(result["losses"]).all()
    assert np.isfinite(result["val_micro_f1"])
    stats = trainer.memory_stats()
    assert stats["feature_bytes_per_chip"] * 8 < 1.5 * stats["feature_bytes_replicated"]


# --------------------------------------------------------------------- probe
def test_linear_probe_separable_data():
    rng = np.random.default_rng(0)
    centers = np.eye(4, 16, dtype=np.float32) * 4
    y = rng.integers(0, 4, 400).astype(np.int32)
    x = centers[y] + rng.normal(0, 0.3, (400, 16)).astype(np.float32)
    preds = np.asarray(
        linear_probe_predict(
            jnp.asarray(x[:300]), jnp.asarray(y[:300]), jnp.asarray(x[300:]), 4
        )
    )
    assert (preds == y[300:]).mean() > 0.95


def test_unsupervised_sharded_layer0_full_matches_single_chip():
    """The shared-table layer 0 composes with the unsupervised sharded step
    (the `_sharded_step` table_fn branch): lockstep parity vs the single-chip
    trainer, same seeds, same key stream."""
    import dataclasses

    from graphsage_tpu.parallel.mesh import make_mesh
    from graphsage_tpu.train.unsupervised import UnsupervisedShardedTrainer

    g, model = _small_setup()
    model = dataclasses.replace(
        model, layer0="full", gather_impl="take", matmul_precision="highest"
    )
    cfg = TrainConfig(
        batch_size=32, num_steps=3, optimizer="adam", learning_rate=0.01,
        objective="unsupervised", walk_length=3, num_negatives=6,
        test_size=40, val_size=40, log_every=0,
    )
    single = UnsupervisedTrainer(model, g, cfg)
    sharded = UnsupervisedShardedTrainer(model, g, cfg, make_mesh({"data": 8}))
    s1, s2 = single.init_state(), sharded.init_state()
    it1, it2 = single.batches(), sharded.batches()
    for _step in range(cfg.num_steps):
        s1, l1 = single.step(s1, next(it1))
        s2, l2 = sharded.step(s2, next(it2))
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5, atol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        s1.params, s2.params,
    )


def test_unsupervised_cached_layer0_matches_full():
    """layer0='cached' composes with the unsupervised objective: the
    graph-context loss over cached-layer0 embeddings equals the
    layer0='full' loss exactly (same estimand, same RNG stream) on both
    the single-chip and the node-sharded trainer."""
    import dataclasses

    from graphsage_tpu.data.graph import with_cached_layer0
    from graphsage_tpu.parallel.mesh import make_mesh
    from graphsage_tpu.train.unsupervised import UnsupervisedShardedTrainer

    g, model = _small_setup()
    model = dataclasses.replace(
        model, layer0="full", gather_impl="take", matmul_precision="highest"
    )
    cached_model = dataclasses.replace(model, layer0="cached")
    gc = with_cached_layer0(g)
    cfg = TrainConfig(
        batch_size=32, num_steps=3, optimizer="adam", learning_rate=0.01,
        objective="unsupervised", walk_length=3, num_negatives=6,
        test_size=40, val_size=40, log_every=0,
    )
    full = UnsupervisedTrainer(model, g, cfg)
    cached = UnsupervisedTrainer(cached_model, gc, cfg)
    sharded = UnsupervisedShardedTrainer(
        cached_model, gc.to_host(), cfg, make_mesh({"data": 8})
    )
    s1, s2, s3 = full.init_state(), cached.init_state(), sharded.init_state()
    it1, it2, it3 = full.batches(), cached.batches(), sharded.batches()
    for _step in range(cfg.num_steps):
        s1, l1 = full.step(s1, next(it1))
        s2, l2 = cached.step(s2, next(it2))
        s3, l3 = sharded.step(s3, next(it3))
        np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(l3), float(l2), rtol=1e-5, atol=1e-6)


# ------------------------------------------------------------ fully sharded
def test_sharded_random_walk_matches_replicated_when_deterministic():
    """On a perfect matching (every node degree 1) the walk step has no
    randomness, so the DISTRIBUTED walk must equal ops.walks.random_walk
    exactly — ids, validity, and the stay-put-after-sink carry logic."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from graphsage_tpu.ops.walks import random_walk
    from graphsage_tpu.parallel.feature_store import (
        shard_adjacency,
        sharded_random_walk,
    )
    from graphsage_tpu.parallel.mesh import make_mesh

    # 16 nodes: pairs (0,1)(2,3)...(12,13); 14 and 15 isolated (sinks).
    edges = np.array([[2 * i, 2 * i + 1] for i in range(7)])
    g = build_graph(np.zeros((16, 4), np.float32), np.zeros(16), edges,
                    num_classes=1, placement="host")
    mesh = make_mesh({"data": 8})
    adj = shard_adjacency(g, 8)
    starts = np.arange(16, dtype=np.int32)
    key = jax.random.PRNGKey(3)

    def walk(ell, deg, indptr, edge_dst, starts_l):
        w, v, viol = sharded_random_walk(
            "data", adj, ell[0], deg[0], indptr[0], edge_dst[0],
            starts_l, 4, key, 4.0,
        )
        return w[None], v[None], viol[None]

    w, v, viol = jax.jit(shard_map(
        walk, mesh=mesh,
        in_specs=((P("data"),) * 4 + (P("data"),)),
        out_specs=(P("data"), P("data"), P("data")),
    ))(adj.ell, adj.degrees, adj.indptr, adj.edge_dst,
       jnp.asarray(starts).reshape(8, 2))
    want_w, want_v = random_walk(jax.random.PRNGKey(9), g.to_device(), starts, 4)
    assert not bool(np.asarray(viol).any())
    np.testing.assert_array_equal(
        np.asarray(w).reshape(16, 5), np.asarray(want_w)
    )
    np.testing.assert_array_equal(
        np.asarray(v).reshape(16, 5), np.asarray(want_v)
    )


def test_sharded_random_walk_first_step_uniform():
    """Chi-square: step 1 of the distributed walk from a degree-8 star
    center is uniform over its neighbors (exercises the per-step key split
    THROUGH sharded_random_walk — a reused key across steps or a biased
    owner fold would skew this)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from graphsage_tpu.parallel.feature_store import (
        shard_adjacency,
        sharded_random_walk,
    )
    from graphsage_tpu.parallel.mesh import make_mesh

    edges = np.array([[0, i] for i in range(1, 9)])
    g = build_graph(np.zeros((16, 4), np.float32), np.zeros(16), edges,
                    num_classes=1, placement="host")
    mesh = make_mesh({"data": 8})
    adj = shard_adjacency(g, 8)

    def walk(ell, deg, indptr, edge_dst, key):
        starts = jnp.zeros(4, jnp.int32)  # every shard starts at the center
        w, v, viol = sharded_random_walk(
            "data", adj, ell[0], deg[0], indptr[0], edge_dst[0],
            starts, 2, key[0], 8.0,
        )
        return w[None], v[None], viol[None]

    f = jax.jit(shard_map(
        walk, mesh=mesh,
        in_specs=((P("data"),) * 4 + (P(),)),
        out_specs=(P("data"), P("data"), P("data")),
    ))
    draws = 150
    keys = jax.random.split(jax.random.PRNGKey(5), draws)
    counts = np.zeros(9)
    for d in range(draws):
        w, v, viol = f(adj.ell, adj.degrees, adj.indptr, adj.edge_dst,
                       jnp.broadcast_to(keys[d], (8, *keys[d].shape)))
        assert not bool(np.asarray(viol).any())
        w = np.asarray(w).reshape(32, 3)
        v = np.asarray(v).reshape(32, 3)
        assert v.all()  # center degree 8, spokes degree 1 — never dies
        np.testing.assert_array_equal(w[:, 2], 0)  # spokes return to center
        counts += np.bincount(w[:, 1], minlength=9)
    samples = counts[1:]  # neighbors 1..8
    n = samples.sum()
    expected = n / 8.0
    chi2 = float(((samples - expected) ** 2 / expected).sum())
    assert chi2 < 24.32, f"chi2={chi2} (df=7, p=0.001 cutoff 24.32)"


def test_unsupervised_fully_sharded_trains_and_probes():
    from graphsage_tpu.parallel.mesh import make_mesh
    from graphsage_tpu.train.unsupervised import (
        UnsupervisedFullyShardedTrainer,
    )

    g, model = _small_setup()
    cfg = TrainConfig(
        batch_size=64, num_steps=16, steps_per_dispatch=4, optimizer="adam",
        learning_rate=0.01, objective="unsupervised", walk_length=3,
        num_negatives=6, test_size=40, val_size=40, log_every=0,
        eval_fanouts=(5, 5),
    )
    trainer = UnsupervisedFullyShardedTrainer(
        model, g.to_host(), cfg, make_mesh({"data": 8}), capacity_slack=8.0
    )
    result = trainer.run(log=None)
    losses = np.asarray(result["losses"])
    assert losses.shape == (16,)
    assert np.isfinite(losses).all()
    # The graph-context objective must actually descend.
    assert losses[-4:].mean() < losses[:4].mean()
    assert np.isfinite(result["val_micro_f1"])
    stats = trainer.memory_stats()
    assert stats["adjacency_bytes_per_chip"] > 0


# ------------------------------------------------------- review regressions
def test_isolated_seed_gradients_finite(tiny_graph):
    """An isolated node drawn as a seed embeds to exactly 0; the vjp of a
    plain L2 norm at 0 is 0/0, and the pair mask zeroes the loss term but
    NOT the NaN inside the norm's backward — one isolated seed would poison
    every parameter through adam. The guarded normalization keeps the dead
    branch's gradient exactly 0."""
    g = tiny_graph  # node 5 is isolated
    model = GraphSAGE(in_dim=g.num_features, num_classes=g.num_classes,
                      hidden_dims=(8, 8), fanouts=(4, 4),
                      final_activation="linear")
    params = model.init(jax.random.PRNGKey(0))
    cdf = jnp.asarray(negative_cdf(np.asarray(g.degrees)))
    seeds = jnp.asarray([0, 1, 5, 2], jnp.int32)  # isolated node included
    loss, grads = jax.value_and_grad(
        lambda p: unsupervised_loss(
            model, p, g, jax.random.PRNGKey(1), seeds, cdf,
            walk_length=3, num_negatives=4,
        )
    )(params)
    assert np.isfinite(float(loss))
    assert all(
        np.isfinite(np.asarray(leaf)).all()
        for leaf in jax.tree_util.tree_leaves(grads)
    ), "NaN gradient from an isolated seed (zero-row normalization)"


def test_predict_honors_eval_fanouts():
    """cfg.eval_fanouts must route the probe through the SAMPLED forward —
    pinned with an lstm model on a hub-capped graph, where the full-graph
    forward is unavailable and ignoring the knob would crash eval."""
    import dataclasses

    g, model = _small_setup()
    model = dataclasses.replace(model, aggregator="lstm", pool_dim=32)
    capped = dataclasses.replace(g, ell_covers_all=False)
    cfg = TrainConfig(
        batch_size=32, num_steps=2, optimizer="adam", learning_rate=0.01,
        objective="unsupervised", walk_length=2, num_negatives=4,
        test_size=40, val_size=40, log_every=0, eval_fanouts=(5, 5),
    )
    tr = UnsupervisedTrainer(model, capped, cfg)
    st = tr.init_state()
    st, _ = tr.step(st, next(tr.batches()))
    preds = tr.predict(st, tr.val_nodes)
    assert preds.shape == (len(tr.val_nodes),)

    # Node-sharded tier: eval_fanouts keeps the probe on the sharded
    # gather (no transient full-table device copy required).
    from graphsage_tpu.parallel.mesh import make_mesh
    from graphsage_tpu.train.unsupervised import UnsupervisedShardedTrainer

    mean_model = dataclasses.replace(model, aggregator="mean", pool_dim=None)
    tr2 = UnsupervisedShardedTrainer(mean_model, g, cfg, make_mesh({"data": 8}))
    st2 = tr2.init_state()
    st2, _ = tr2.step(st2, next(tr2.batches()))
    preds2 = tr2.predict(st2, tr2.val_nodes)
    assert preds2.shape == (len(tr2.val_nodes),)


def test_config_rejects_bad_objective_and_walk_length():
    with pytest.raises(ValueError, match="objective"):
        TrainConfig(objective="unsupervized")  # typo must not train supervised
    with pytest.raises(ValueError, match="walk_length"):
        TrainConfig(objective="unsupervised", walk_length=0)
    with pytest.raises(ValueError, match="num_negatives"):
        TrainConfig(objective="unsupervised", num_negatives=0)


def test_unsupervised_fully_sharded_layer0_full_smoke():
    """layer0='full' composes with the distributed-walk trainer (the
    _layer0_table_fn_adj branch of the unsupervised step): finite losses
    that descend, probe finite."""
    import dataclasses

    from graphsage_tpu.parallel.mesh import make_mesh
    from graphsage_tpu.train.unsupervised import (
        UnsupervisedFullyShardedTrainer,
    )

    g, model = _small_setup()
    model = dataclasses.replace(model, layer0="full")
    cfg = TrainConfig(
        batch_size=64, num_steps=12, steps_per_dispatch=4, optimizer="adam",
        learning_rate=0.01, objective="unsupervised", walk_length=2,
        num_negatives=5, test_size=40, val_size=40, log_every=0,
        eval_fanouts=(5, 5),
    )
    trainer = UnsupervisedFullyShardedTrainer(
        model, g.to_host(), cfg, make_mesh({"data": 8}), capacity_slack=8.0
    )
    result = trainer.run(log=None)
    losses = np.asarray(result["losses"])
    assert np.isfinite(losses).all()
    assert losses[-4:].mean() < losses[:4].mean()
    assert np.isfinite(result["val_micro_f1"])


def test_pick_positive_step_uniform_over_visited():
    """Chi-square: the positive pick is uniform over a walk's VALID steps
    (a biased idx rounding would systematically over-weight early steps —
    skewing every context pair on both the replicated and the distributed
    paths, which share this helper)."""
    from graphsage_tpu.ops.walks import pick_positive_step

    walks = jnp.asarray([[9, 11, 12, 13, 14, 15]], jnp.int32)  # 5 visited
    valid = jnp.ones((1, 6), bool)
    seeds = jnp.asarray([9], jnp.int32)
    draws = 4000
    keys = jax.random.split(jax.random.PRNGKey(2), draws)
    pos, mask = jax.vmap(
        lambda k: pick_positive_step(k, walks, valid, seeds)
    )(keys)
    assert bool(np.asarray(mask).all())
    counts = np.bincount(np.asarray(pos).reshape(-1) - 11, minlength=5)
    expected = draws / 5.0
    chi2 = float(((counts - expected) ** 2 / expected).sum())
    assert chi2 < 18.47, f"chi2={chi2} (df=4, p=0.001 cutoff 18.47)"
    # Prefix-masked walk: only the valid prefix is ever picked.
    valid2 = jnp.asarray([[True, True, True, False, False, False]])
    pos2, mask2 = jax.vmap(
        lambda k: pick_positive_step(k, walks, valid2, seeds)
    )(keys[:500])
    assert bool(np.asarray(mask2).all())
    assert set(np.asarray(pos2).reshape(-1)) <= {11, 12}
