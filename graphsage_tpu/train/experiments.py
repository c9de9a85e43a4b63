"""Reference-compatible experiment drivers.

``run_cora()`` / ``run_pubmed()`` reproduce the observable surface of the
reference's entry points (reference graphsage/model.py:65-106, 137-178):
load the dataset from the original file formats, train the preset config,
print per-batch loss lines and finally ``Validation F1`` + ``Average batch
time``. ``run_preset`` is the general driver behind them and the CLI.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Optional

import jax.numpy as jnp

from graphsage_tpu.data.graph import Graph
from graphsage_tpu.data.loaders import load_cora, load_pubmed
from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.train.config import ExperimentConfig, PRESETS
from graphsage_tpu.train.trainer import Trainer


def load_dataset(
    name: str, data_root: str | None = None, placement: str = "device"
) -> Graph:
    """``placement="host"`` keeps the graph in host numpy — the sharded
    modes load this way so a full device table is never even transiently
    resident (docs/DISTRIBUTED.md "Host-resident graphs")."""
    if name == "cora":
        return load_cora(data_root or "cora", placement=placement)
    if name == "pubmed":
        return load_pubmed(data_root or "pubmed-data", placement=placement)
    if name == "powerlaw":
        # homophily makes the preset learnable in pure-neighbor-mean mode
        # (see power_law_graph); throughput benches construct their own
        # graphs with the default 0.
        return power_law_graph(
            num_nodes=100_000, num_edges=2_000_000, num_feats=256,
            num_classes=16, homophily=0.8, placement=placement,
        )
    if name == "reddit":
        # BASELINE config #5 shape: 232K nodes / ~11.6M directed edge slots,
        # 602 features, 41 classes (the real dataset's dims; synthetic
        # stand-in — no network in-sandbox). bf16 features: the payload is
        # 232965*602 rows, 270 MB instead of 561.
        import jax.numpy as _jnp

        return power_law_graph(
            num_nodes=232_965, num_edges=5_800_000, num_feats=602,
            num_classes=41, homophily=0.8, feature_dtype=_jnp.bfloat16,
            placement=placement,
        )
    if name == "powerlaw_1m":
        # BASELINE config #4 shape: 1M nodes / 20M directed edge slots.
        import jax.numpy as _jnp

        return power_law_graph(
            num_nodes=1_000_000, num_edges=10_000_000, num_feats=256,
            num_classes=32, homophily=0.8, feature_dtype=_jnp.bfloat16,
            placement=placement,
        )
    raise ValueError(f"unknown dataset {name!r}")


def build_model(config: ExperimentConfig, graph: Graph) -> GraphSAGE:
    m = config.model
    compute_dtype = jnp.bfloat16 if m.compute_dtype == "bfloat16" else None
    return GraphSAGE(
        in_dim=graph.num_features,
        num_classes=graph.num_classes,
        hidden_dims=tuple(m.hidden_dims),
        fanouts=tuple(m.fanouts),
        aggregator=m.aggregator,
        concat_self=m.concat_self,
        self_loop=m.self_loop,
        pool_dim=m.pool_dim,
        compute_dtype=compute_dtype,
        project_first=m.project_first,
        gather_impl=m.gather_impl,
        spmm_impl=m.spmm_impl,
        layer0=m.layer0,
        final_activation=m.final_activation,
        sampling=m.sampling,
    )


def run_preset(
    name: str,
    data_root: str | None = None,
    log: Callable[[str], None] | None = print,
    overrides: dict[str, Any] | None = None,
    checkpoint_path: str | None = None,
    mode: str = "sampled",
    resume_path: str | None = None,
    eval_only: bool = False,
    checkpoint_every: int = 0,
    hub_cache_rows: int = 0,
) -> dict[str, Any]:
    """Train one of the BASELINE.json preset configs end to end.

    ``mode``: "sampled" (minibatch neighbor sampling, the reference's
    training scheme), "full-graph" (transductive full-batch), "sharded"
    (node-sharded feature store over every visible device — per-chip
    feature memory N/S*F, host-resident source graph), or "fully-sharded"
    (adjacency + features + batch all sharded, distributed per-hop
    sampling). ``resume_path``: restore a checkpoint written by
    ``checkpoint_path`` and continue training from it (checkpoint-restart,
    SURVEY.md §5.3/5.4)."""
    if hub_cache_rows and mode not in ("sharded", "fully-sharded"):
        raise ValueError(
            "hub_cache_rows is a sharded-trainer lever (the single-table "
            f"modes gather locally); got mode={mode!r} — drop the flag or "
            "use mode='sharded'/'fully-sharded'"
        )
    config = PRESETS[name]
    if overrides:
        train_over = {k: v for k, v in overrides.items()
                      if k in {f.name for f in dataclasses.fields(config.train)}}
        model_over = {k: v for k, v in overrides.items()
                      if k in {f.name for f in dataclasses.fields(config.model)}}
        config = dataclasses.replace(
            config,
            train=dataclasses.replace(config.train, **train_over),
            model=dataclasses.replace(config.model, **model_over),
        )
    graph = load_dataset(
        config.dataset, data_root,
        # Sharded modes load host-resident so no full device table ever
        # exists (not even transiently at load time).
        placement="host" if mode in ("sharded", "fully-sharded") else "device",
    )
    if config.model.quantize_features:
        # Works in every mode: single-table trainers gather int8 rows
        # locally; the sharded store shards q + scales and its cross-shard
        # exchanges move int8 rows + 4-byte scales (F+4 bytes/row vs 4F).
        from graphsage_tpu.data.graph import quantize_graph

        graph = quantize_graph(graph)
        if log:
            log(f"feature table quantized to int8: "
                f"{graph.features.nbytes} B"
                + (" (host)" if graph.on_host else " resident"))
    model = build_model(config, graph)
    if config.train.objective == "unsupervised":
        if mode == "sampled":
            from graphsage_tpu.train.unsupervised import UnsupervisedTrainer

            trainer = UnsupervisedTrainer(model, graph, config.train)
        elif mode in ("sharded", "fully-sharded"):
            import jax as _jax

            from graphsage_tpu.parallel.mesh import make_mesh
            from graphsage_tpu.train.unsupervised import (
                UnsupervisedFullyShardedTrainer,
                UnsupervisedShardedTrainer,
            )

            s = len(_jax.devices())
            if config.train.batch_size % s:
                raise ValueError(
                    f"batch_size {config.train.batch_size} is not divisible "
                    f"by the {s} visible devices; pass --batch-size"
                )
            cls = (
                UnsupervisedShardedTrainer
                if mode == "sharded"
                else UnsupervisedFullyShardedTrainer
            )
            trainer = cls(
                model, graph, config.train, make_mesh({"data": s}),
                **({"hub_cache_rows": hub_cache_rows, "gather_mode": "compact"}
                   if hub_cache_rows and mode == "sharded"
                   else {"hub_cache_rows": hub_cache_rows}
                   if hub_cache_rows else {}),
            )
        else:
            raise ValueError(
                "objective='unsupervised' supports mode='sampled', the "
                "node-sharded mode='sharded', and the everything-sharded "
                f"mode='fully-sharded' (got mode={mode!r})"
            )
    elif mode == "full-graph":
        import dataclasses as _dc

        from graphsage_tpu.train.full_graph import FullGraphTrainer

        fg_model = _dc.replace(model, fanouts=tuple(None for _ in model.fanouts))
        trainer = FullGraphTrainer(fg_model, graph, config.train)
    elif mode in ("sharded", "fully-sharded"):
        import jax

        from graphsage_tpu.parallel.feature_store import (
            FullyShardedTrainer,
            ShardedFeatureTrainer,
        )
        from graphsage_tpu.parallel.mesh import make_mesh

        s = len(jax.devices())
        if config.train.batch_size % s:
            raise ValueError(
                f"batch_size {config.train.batch_size} is not divisible by "
                f"the {s} visible devices; pass --batch-size"
            )
        mesh = make_mesh({"data": s})
        # The graph was loaded host-resident above: per-chip shards become
        # the only graph-sized device buffers.
        cls = (
            FullyShardedTrainer if mode == "fully-sharded"
            else ShardedFeatureTrainer
        )
        trainer = cls(
            model, graph, config.train, mesh,
            **({"hub_cache_rows": hub_cache_rows, "gather_mode": "compact"}
               if hub_cache_rows and mode == "sharded"
               else {"hub_cache_rows": hub_cache_rows}
               if hub_cache_rows else {}),
        )
        if log:
            stats = trainer.memory_stats()
            log(f"{mode} over {s} device(s): "
                f"{stats['feature_bytes_per_chip']} feature B/chip "
                f"(replicated would be {stats['feature_bytes_replicated']})")
    elif mode == "sampled":
        trainer = Trainer(model, graph, config.train)
    else:
        raise ValueError(f"unknown mode {mode!r}")
    initial_state = None
    if resume_path:
        from graphsage_tpu.utils.checkpoint import restore_checkpoint

        initial_state = restore_checkpoint(resume_path, trainer.init_state())
        if log:
            log(f"resumed from {resume_path} at step "
                f"{int(initial_state.step)}")
    if eval_only:
        if initial_state is None:
            raise ValueError("eval_only requires resume_path (a trained state)")
        if checkpoint_path:
            raise ValueError(
                "eval_only does not train — combining it with checkpoint_path "
                "would silently write nothing; drop one of the two"
            )
        val = trainer.evaluate(initial_state, trainer.val_nodes)
        test = trainer.evaluate(initial_state, trainer.test_nodes)
        if log:
            log(f"Validation F1: {val['micro_f1']}")
            log(f"Test F1: {test['micro_f1']}")
        return {
            "losses": [],
            "val_micro_f1": val["micro_f1"],
            "val_macro_f1": val["macro_f1"],
            "test_micro_f1": test["micro_f1"],
            "test_macro_f1": test["macro_f1"],
            "mean_step_time": 0.0,
            "state": initial_state,
        }
    result = trainer.run(
        log=log, initial_state=initial_state,
        checkpoint_path=checkpoint_path, checkpoint_every=checkpoint_every,
    )
    if checkpoint_path:
        from graphsage_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(checkpoint_path, result["state"])
        if log:
            log(f"checkpoint written: {checkpoint_path}")
    return result


def run_cora(data_root: str | None = None, **kwargs) -> dict[str, Any]:
    """The reference's `run_cora` surface (model.py:65-106): 100 x 256-node
    batches, SGD lr 0.7, per-batch loss lines, final val micro-F1."""
    return run_preset("cora", data_root=data_root, **kwargs)


def run_pubmed(data_root: str | None = None, **kwargs) -> dict[str, Any]:
    """The reference's `run_pubmed` surface (model.py:137-178)."""
    return run_preset("pubmed", data_root=data_root, **kwargs)


def main(argv: Optional[list[str]] = None) -> None:
    import argparse

    parser = argparse.ArgumentParser(
        prog="python -m graphsage_tpu.train",
        description="Train a TPU-native GraphSAGE model (presets mirror the "
        "reference's run_cora/run_pubmed plus the BASELINE.json configs).",
    )
    parser.add_argument("--preset", default="cora", choices=sorted(PRESETS))
    parser.add_argument(
        "--mode", default="sampled",
        choices=("sampled", "full-graph", "sharded", "fully-sharded"),
    )
    parser.add_argument("--data-root", default=None,
                        help="dataset directory (cora/ or pubmed-data/ layout)")
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--batching", choices=("epoch", "reference"), default=None)
    parser.add_argument("--test-size", type=int, default=None)
    parser.add_argument("--val-size", type=int, default=None)
    parser.add_argument("--checkpoint", default=None, help="write final state here")
    parser.add_argument("--checkpoint-every", type=int, default=0,
                        help="also snapshot --checkpoint every N steps "
                             "(checkpoint-restart failure tolerance)")
    parser.add_argument("--resume", default=None,
                        help="restore this checkpoint and continue training")
    parser.add_argument("--eval-only", action="store_true",
                        help="evaluate a --resume checkpoint (val + test F1; "
                        "the reference computes its test split but never "
                        "evaluates it — quirk Q6) without training")
    parser.add_argument("--diagnostics-dir", default=None,
                        help="collect fault/hang stack traces here during "
                             "training (cloud-tpu-diagnostics; SURVEY §5.3)")
    parser.add_argument("--debug-nans", action="store_true",
                        help="enable jax_debug_nans (fail fast on NaN, "
                        "SURVEY.md §5.2 — e.g. Q4-class bugs)")
    parser.add_argument("--sampling", choices=("floyd", "topk", "windowed"),
                        default=None,
                        help="neighbor sampler: floyd (exact uniform, "
                        "default) | windowed (one CSR lane fetch per "
                        "parent, unbiased-mean semantics)")
    parser.add_argument("--layer0", choices=("sampled", "full", "cached"),
                        default=None,
                        help="layer-0 formulation: sampled (the reference's "
                        "estimator, default) | full (one full-graph pass "
                        "per step; wins when E < B*prod(fanouts)) | cached "
                        "(frozen-aggregate table built once — the deepest "
                        "hop vanishes from the step; docs/ROOFLINE 5.1b)")
    parser.add_argument("--hub-cache-rows", type=int, default=0,
                        help="sharded modes: replicate this many top-degree "
                        "feature rows so hub-skewed requests bypass the "
                        "compact exchange (docs/DISTRIBUTED.md)")
    parser.add_argument("--quantize-features", action="store_true",
                        help="int8-quantize the frozen feature table at load "
                        "time (2-4x smaller resident table, int8 deepest-hop "
                        "gathers; sharded modes exchange int8 rows + scales)")
    parser.add_argument("--compilation-cache", default=None, metavar="DIR",
                        help="persistent XLA compilation cache directory "
                        "(default ~/.cache/graphsage_tpu/xla — restarted "
                        "runs replay 20-40s TPU compiles from disk)")
    parser.add_argument("--no-compilation-cache", action="store_true",
                        help="disable the persistent compilation cache")
    parser.add_argument("--quiet", action="store_true", help="suppress per-step loss")
    parser.add_argument("--log-jsonl", default=None,
                        help="append structured metrics records to this file")
    args = parser.parse_args(argv)

    overrides: dict[str, Any] = {}
    if args.steps is not None:
        overrides["num_steps"] = args.steps
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    if args.lr is not None:
        overrides["learning_rate"] = args.lr
    if args.seed is not None:
        overrides["seed"] = args.seed
    if args.batching is not None:
        overrides["batching"] = args.batching
    if args.test_size is not None:
        overrides["test_size"] = args.test_size
    if args.val_size is not None:
        overrides["val_size"] = args.val_size
    if args.quantize_features:
        overrides["quantize_features"] = True
    if args.sampling is not None:
        overrides["sampling"] = args.sampling
    if args.layer0 is not None:
        overrides["layer0"] = args.layer0
    if args.quiet:
        overrides["log_every"] = 0

    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)

    if not args.no_compilation_cache:
        from graphsage_tpu.utils.compile_cache import enable as _enable_cache

        _enable_cache(args.compilation_cache)

    import contextlib

    from graphsage_tpu.utils.diagnostics import diagnose

    diag = (
        diagnose(stack_trace_dir=args.diagnostics_dir)
        if args.diagnostics_dir
        else contextlib.nullcontext()
    )
    with diag:
        result = run_preset(
            args.preset,
            data_root=args.data_root,
            overrides=overrides or None,
            checkpoint_path=args.checkpoint,
            mode=args.mode,
            resume_path=args.resume,
            eval_only=args.eval_only,
            checkpoint_every=args.checkpoint_every,
            hub_cache_rows=args.hub_cache_rows,
        )
    if args.log_jsonl:
        from graphsage_tpu.utils.logging import MetricsLogger

        with MetricsLogger(args.log_jsonl, stdout=False, run_name=args.preset) as ml:
            for i, loss in enumerate(result["losses"]):
                ml.log("step", step=i, loss=loss)
            ml.log("eval", val_micro_f1=result["val_micro_f1"],
                   val_macro_f1=result["val_macro_f1"],
                   mean_step_time=result["mean_step_time"])
