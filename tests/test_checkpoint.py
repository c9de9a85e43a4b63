"""Checkpoint round-trip: full TrainState save/restore and resume-equivalence."""

import dataclasses

import jax
import numpy as np
import pytest

from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.train.config import TrainConfig
from graphsage_tpu.train.trainer import Trainer
from graphsage_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint


@pytest.fixture(scope="module")
def setup():
    graph = power_law_graph(num_nodes=100, num_edges=400, num_feats=8, num_classes=3, seed=5)
    model = GraphSAGE(in_dim=8, num_classes=3, hidden_dims=(8, 8), fanouts=(3, 3))
    trainer = Trainer(model, graph, TrainConfig(
        batch_size=16, num_steps=2, test_size=20, val_size=20, log_every=0))
    return graph, model, trainer


def test_roundtrip_identical(tmp_path, setup):
    _, _, trainer = setup
    state = trainer.init_state()
    it = trainer.batches()
    state, _ = trainer.step(state, next(it))
    path = save_checkpoint(tmp_path / "ckpt", state)

    template = trainer.init_state()
    restored = restore_checkpoint(path, template)
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_training_equivalence(tmp_path, setup):
    """train 2 steps straight == train 1, checkpoint, restore, train 1."""
    _, _, trainer = setup
    it = trainer.batches()
    b1, b2 = next(it), next(it)

    s = trainer.init_state()
    s, _ = trainer.step(s, b1)
    s, _ = trainer.step(s, b2)

    t = trainer.init_state()
    t, _ = trainer.step(t, b1)
    path = save_checkpoint(tmp_path / "mid", t)
    t2 = restore_checkpoint(path, trainer.init_state())
    t2, _ = trainer.step(t2, b2)

    for a, b in zip(jax.tree_util.tree_leaves(s.params), jax.tree_util.tree_leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_restore_shape_mismatch_raises(tmp_path, setup):
    _, _, trainer = setup
    state = trainer.init_state()
    path = save_checkpoint(tmp_path / "ck2", state)

    other_model = GraphSAGE(in_dim=8, num_classes=3, hidden_dims=(16, 8), fanouts=(3, 3))
    other = Trainer(other_model, power_law_graph(100, 400, 8, 3, seed=5),
                    TrainConfig(batch_size=16, test_size=20, val_size=20))
    with pytest.raises(ValueError):
        restore_checkpoint(path, other.init_state())


def test_restore_missing_file_raises(tmp_path, setup):
    _, _, trainer = setup
    with pytest.raises(FileNotFoundError):
        restore_checkpoint(tmp_path / "nope", trainer.init_state())


def test_embed_api_matches_head_input(tmp_path):
    """model.embed returns the representation the head consumes."""
    import jax
    import jax.numpy as jnp
    from graphsage_tpu.data.synthetic import power_law_graph
    from graphsage_tpu.models.graphsage import GraphSAGE

    g = power_law_graph(num_nodes=50, num_edges=120, num_feats=12, num_classes=3, seed=0)
    model = GraphSAGE(in_dim=12, num_classes=3, hidden_dims=(6, 6), fanouts=(3, 3),
                      matmul_precision="highest", gather_impl="take")
    params = model.init(jax.random.PRNGKey(0))
    seeds = jnp.arange(16, dtype=jnp.int32)
    key = jax.random.PRNGKey(1)
    emb = model.embed(params, key, g, seeds)
    assert emb.shape == (16, 6)
    logits = model.apply(params, key, g, seeds)
    np.testing.assert_allclose(
        np.asarray(emb @ params.head), np.asarray(logits), rtol=1e-5, atol=1e-6
    )
    emb_fg = model.embed_full_graph(params, g)
    assert emb_fg.shape == (50, 6)
    logits_fg = model.forward_full_graph(params, g)
    np.testing.assert_allclose(
        np.asarray(emb_fg @ params.head), np.asarray(logits_fg), rtol=1e-5, atol=1e-6
    )


def test_orbax_roundtrip(tmp_path):
    import jax.numpy as jnp
    from graphsage_tpu.utils.checkpoint import (
        restore_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    state = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
             "b": {"c": jnp.ones((4,), jnp.int32)}}
    p = save_checkpoint_orbax(tmp_path / "ckpt_orbax", state)
    template = jax.tree_util.tree_map(jnp.zeros_like, state)
    back = restore_checkpoint_orbax(p, template)
    for k in ("a",):
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(state[k]))
    np.testing.assert_array_equal(np.asarray(back["b"]["c"]), np.asarray(state["b"]["c"]))


def test_resume_continues_batch_stream(synth_cora_root):
    """Review finding: a resumed run must continue the seed stream from
    state.step, not replay the head batches."""
    import graphsage_tpu as gt

    graph = gt.load_cora(synth_cora_root)
    model = gt.GraphSAGE(in_dim=graph.num_features, num_classes=graph.num_classes,
                         hidden_dims=(8, 8), fanouts=(3, 3))
    cfg = gt.TrainConfig(num_steps=4, log_every=0, batch_size=32,
                         test_size=100, val_size=80)
    tr = gt.Trainer(model, graph, cfg)
    full = tr.run(log=None)  # 4 uninterrupted steps

    tr2 = gt.Trainer(model, graph, dataclasses.replace(cfg, num_steps=2))
    first = tr2.run(log=None)
    tr3 = gt.Trainer(model, graph, dataclasses.replace(cfg, num_steps=2))
    resumed = tr3.run(log=None, initial_state=first["state"])
    np.testing.assert_allclose(
        np.asarray(full["losses"]),
        np.asarray(first["losses"] + resumed["losses"]),
        rtol=1e-5,
    )


def test_sharded_trainer_checkpoint_and_restart(tmp_path):
    """The same kill-and-resume guarantee holds for the node-sharded
    trainer: snapshots written mid-run restore into a fresh
    ShardedFeatureTrainer and the resumed run matches the uninterrupted
    one (params live replicated in the state; the sharded stores rebuild
    from the graph at construction)."""
    from graphsage_tpu.data.synthetic import power_law_graph
    from graphsage_tpu.models.graphsage import GraphSAGE
    from graphsage_tpu.parallel.feature_store import ShardedFeatureTrainer
    from graphsage_tpu.parallel.mesh import make_mesh
    from graphsage_tpu.train.config import TrainConfig
    from graphsage_tpu.utils.checkpoint import restore_checkpoint

    g = power_law_graph(num_nodes=120, num_edges=500, num_feats=12,
                        num_classes=4, seed=6)
    model = GraphSAGE(in_dim=12, num_classes=4, hidden_dims=(8, 8),
                      fanouts=(3, 3))
    path = str(tmp_path / "snap.npz")
    mesh = make_mesh({"data": 8})

    def mk(steps):
        cfg = TrainConfig(batch_size=16, num_steps=steps, learning_rate=0.5,
                          test_size=20, val_size=20, log_every=0,
                          steps_per_dispatch=2)
        return ShardedFeatureTrainer(model, g, cfg, mesh,
                                     gather_mode="compact",
                                     capacity_slack=8.0)

    full = mk(8).run(log=None)
    mk(4).run(log=None, checkpoint_path=path, checkpoint_every=2)
    t2 = mk(4)
    resumed_state = restore_checkpoint(path, t2.init_state())
    assert int(resumed_state.step) == 4
    resumed = t2.run(log=None, initial_state=resumed_state)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        full["state"].params, resumed["state"].params,
    )


def test_periodic_checkpoint_and_restart(tmp_path):
    """Failure tolerance (SURVEY §5.3): a run snapshotting every N steps can
    be killed and resumed from the last snapshot, and the resumed run ends
    in the same state as an uninterrupted one."""
    from graphsage_tpu.data.synthetic import power_law_graph
    from graphsage_tpu.models.graphsage import GraphSAGE
    from graphsage_tpu.train.config import TrainConfig
    from graphsage_tpu.train.trainer import Trainer
    from graphsage_tpu.utils.checkpoint import restore_checkpoint

    g = power_law_graph(num_nodes=120, num_edges=500, num_feats=12,
                        num_classes=4, seed=6)
    model = GraphSAGE(in_dim=12, num_classes=4, hidden_dims=(8,), fanouts=(3,))
    path = str(tmp_path / "snap.npz")

    def mk(steps):
        cfg = TrainConfig(batch_size=16, num_steps=steps, learning_rate=0.5,
                          test_size=20, val_size=20, log_every=0,
                          steps_per_dispatch=2)
        return Trainer(model, g, cfg)

    # Uninterrupted 8-step run.
    full = mk(8).run(log=None)

    # "Crashing" run: snapshot every 2 steps, pretend it died after step 4
    # by restoring the mid-run snapshot (num_steps=4 => last snapshot at 4).
    mk(4).run(log=None, checkpoint_path=path, checkpoint_every=2)
    t2 = mk(4)  # 4 MORE steps after resume
    resumed_state = restore_checkpoint(path, t2.init_state())
    assert int(resumed_state.step) == 4
    resumed = t2.run(log=None, initial_state=resumed_state)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        full["state"].params, resumed["state"].params,
    )
