"""Experiment drivers and CLI surface."""

import numpy as np
import pytest

from graphsage_tpu.train.experiments import load_dataset, main, run_preset


def test_run_cora_preset_end_to_end(synth_cora_root, capsys):
    result = run_preset(
        "cora",
        data_root=synth_cora_root,
        overrides={"num_steps": 5, "test_size": 100, "val_size": 80,
                   "batch_size": 32, "log_every": 1},
    )
    out = capsys.readouterr().out
    assert "Validation F1:" in out
    assert "Average batch time:" in out
    assert len(result["losses"]) == 5
    assert np.isfinite(result["losses"]).all()


def test_run_pubmed_preset(synth_pubmed_root):
    result = run_preset(
        "pubmed",
        data_root=synth_pubmed_root,
        overrides={"num_steps": 3, "test_size": 60, "val_size": 50,
                   "batch_size": 32, "log_every": 0},
    )
    assert len(result["losses"]) == 3


def test_cli_main(synth_cora_root, tmp_path, capsys):
    ckpt = tmp_path / "final.npz"
    main([
        "--preset", "cora", "--data-root", str(synth_cora_root),
        "--steps", "3", "--batch-size", "16", "--lr", "0.3",
        "--test-size", "100", "--val-size", "80",
        "--quiet", "--checkpoint", str(ckpt),
    ])
    out = capsys.readouterr().out
    assert "Validation F1:" in out
    assert ckpt.exists()
    # CLI must fail loudly on bad presets
    with pytest.raises(SystemExit):
        main(["--preset", "nope"])


def test_cli_layer0_override(synth_cora_root, capsys):
    # --layer0 cached flows through to the model config; the trainer
    # auto-builds the frozen-aggregate cache (trainer.py) so the preset
    # needs no cached-specific dataset plumbing.
    main([
        "--preset", "cora", "--data-root", str(synth_cora_root),
        "--layer0", "cached", "--steps", "3", "--batch-size", "16",
        "--test-size", "100", "--val-size", "80", "--quiet",
    ])
    out = capsys.readouterr().out
    assert "Validation F1:" in out


def test_load_dataset_unknown():
    with pytest.raises(ValueError):
        load_dataset("no_such_dataset")


def test_cli_full_graph_mode(synth_cora_root, capsys):
    main([
        "--preset", "cora", "--data-root", str(synth_cora_root),
        "--mode", "full-graph", "--steps", "5", "--lr", "0.3",
        "--test-size", "100", "--val-size", "80", "--quiet",
    ])
    out = capsys.readouterr().out
    assert "Validation F1:" in out


def test_cli_checkpoint_then_resume(synth_cora_root, tmp_path, capsys):
    from graphsage_tpu.train.experiments import main

    ckpt = str(tmp_path / "state")
    main(["--preset", "cora", "--data-root", synth_cora_root,
          "--test-size", "100", "--val-size", "80",
          "--steps", "3", "--quiet", "--checkpoint", ckpt])
    main(["--preset", "cora", "--data-root", synth_cora_root,
          "--test-size", "100", "--val-size", "80",
          "--steps", "2", "--quiet", "--resume", ckpt + ".npz"])
    out = capsys.readouterr().out
    assert "resumed from" in out and "at step 3" in out


def test_cli_eval_only(synth_cora_root, tmp_path, capsys):
    from graphsage_tpu.train.experiments import main

    ckpt = str(tmp_path / "state")
    main(["--preset", "cora", "--data-root", synth_cora_root,
          "--test-size", "100", "--val-size", "80",
          "--steps", "5", "--quiet", "--checkpoint", ckpt])
    main(["--preset", "cora", "--data-root", synth_cora_root,
          "--test-size", "100", "--val-size", "80",
          "--eval-only", "--resume", ckpt + ".npz"])
    out = capsys.readouterr().out
    assert "Validation F1:" in out and "Test F1:" in out


def test_reference_presets_use_sampled_eval(synth_cora_root):
    """The cora/pubmed presets must print the reference's OBSERVABLE
    Validation F1 — the stochastic sampled-eval quantity (SURVEY §3.3) —
    so eval_fanouts is set and predict() takes the sampled path."""
    import dataclasses as dc

    import numpy as np

    import graphsage_tpu as gt
    from graphsage_tpu.train.config import PRESETS

    for name in ("cora", "cora_intent", "pubmed"):
        assert PRESETS[name].train.eval_fanouts is not None, name
        assert tuple(PRESETS[name].train.eval_fanouts) == tuple(
            PRESETS[name].model.fanouts
        ), name

    preset = PRESETS["cora"]
    graph = gt.load_cora(synth_cora_root)
    model = gt.GraphSAGE(
        in_dim=graph.num_features, num_classes=graph.num_classes,
        hidden_dims=tuple(preset.model.hidden_dims),
        fanouts=tuple(preset.model.fanouts),
    )
    cfg = dc.replace(preset.train, num_steps=2, test_size=60, val_size=30,
                     log_every=0)
    tr = gt.Trainer(model, graph, cfg)
    state = tr.init_state()
    preds = tr.predict(state, tr.val_nodes)
    assert tr._eval_model is not None  # sampled-eval path was taken
    assert preds.shape == (30,)


def test_run_preset_sharded_mode(synth_cora_root):
    """--mode sharded trains through the node-sharded feature store over
    the visible devices with a host-resident source graph."""
    from graphsage_tpu.train.experiments import run_preset

    res = run_preset(
        "cora", data_root=str(synth_cora_root), log=None, mode="sharded",
        overrides={"num_steps": 2, "batch_size": 64, "log_every": 0,
                   "test_size": 80, "val_size": 80},
    )
    import numpy as np

    assert np.isfinite(res["losses"]).all()
    assert len(res["losses"]) == 2


def test_compilation_cache_writes_entries(tmp_path, monkeypatch):
    """utils/compile_cache.enable routes XLA programs to the persistent
    cache (the relay's 20-40s compiles replay from disk on restart)."""
    import os

    import jax
    import jax.numpy as jnp

    from graphsage_tpu.utils.compile_cache import enable

    d = enable(str(tmp_path / "xla"), min_compile_seconds=0.0)
    try:
        f = jax.jit(lambda x: jnp.tanh(x @ x.T).sum() * 3)
        f(jnp.ones((48, 48))).block_until_ready()
        assert len(os.listdir(d)) > 0
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_bench_row_errors_are_contained():
    """bench._try_row converts a row crash into an error record so the
    driver still gets its single JSON line when one config fails."""
    import sys

    sys.path.insert(0, ".")
    try:
        from bench import _try_row
    finally:
        sys.path.pop(0)

    ok = _try_row(lambda: {"edges_per_s": 5.0, "final_loss": 0.1}, "ok")
    assert ok["edges_per_s"] == 5.0
    bad = _try_row(lambda: 1 / 0, "boom")
    assert "ZeroDivisionError" in bad["error"]
    assert bad["edges_per_s"] == 0.0
    import numpy as np

    assert not np.isfinite(bad["final_loss"])  # trips the learning floor
