"""Experiment configuration.

The reference hardcodes every hyperparameter inside ``run_cora``/``run_pubmed``
(reference graphsage/model.py:65-106,137-178; SURVEY.md §5.6). Here the same
knobs are explicit dataclasses, JSON round-trippable, with presets for each
BASELINE.json config. Fanouts are *real* configuration — the reference's dead
``num_samples`` attribute (quirk Q1) is fixed by design; the presets record
both the reference's shipped behavior (fanout 10/10) and its intent.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Sequence


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    hidden_dims: Sequence[int] = (128, 128)
    fanouts: Sequence[Optional[int]] = (10, 10)
    aggregator: str = "mean"  # "mean" | "maxpool" | "lstm" (paper §3.3 family)
    concat_self: bool = False  # False = reference shipped mode (quirk Q2)
    # GCN-style self loops (the reference's intended-but-dead gcn branch).
    self_loop: bool = False
    pool_dim: Optional[int] = None  # maxpool MLP width / lstm hidden width
    compute_dtype: Optional[str] = None  # None | "bfloat16"
    # Kernel backends (see ops.aggregate): "auto" | explicit impl name.
    gather_impl: str = "auto"
    spmm_impl: str = "auto"
    # Project-then-aggregate reordering for the mean aggregator (exact math;
    # see GraphSAGE.project_first). "auto" | True | False.
    project_first: object = "auto"
    # Layer-0 mode: "sampled" | "full" (shared-table layer 0, recomputed
    # per step; wins when num_edges < B * prod(fanouts)) | "cached" (the
    # frozen-feature precompute D^-1 A X — no per-step deepest hop at all;
    # see GraphSAGE.layer0 and data.graph.with_cached_layer0).
    layer0: str = "sampled"
    # Int8-quantize the frozen feature table at load time (ops/quantize.py):
    # 2-4x smaller resident table, int8 deepest-hop gathers; in the sharded
    # modes the cross-shard row exchanges move int8 rows + 4-byte scales.
    quantize_features: bool = False
    # Last-layer nonlinearity: "relu" (reference behavior) | "linear"
    # (required by objective="unsupervised" — see GraphSAGE.final_activation).
    final_activation: str = "relu"
    # Neighbor-sampling mechanism: "floyd" (exact uniform k-subsets, the
    # reference semantics) | "topk" | "windowed" (one CSR lane fetch per
    # parent, unbiased-mean semantics — see GraphSAGE.sampling).
    sampling: str = "floyd"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 256
    num_steps: int = 100
    learning_rate: float = 0.7  # reference model.py:89
    # Reference uses plain SGD; momentum/adam are framework extensions.
    optimizer: str = "sgd"  # "sgd" | "momentum" | "adam"
    momentum: float = 0.9  # used by optimizer="momentum"
    seed: int = 1
    # Split sizes follow the reference: first `test_size` of a seeded
    # permutation are test (computed but unused there — quirk Q6), next
    # `val_size` validation, the rest training (model.py:84-87).
    test_size: int = 1000
    val_size: int = 500
    # "reference": next batch = head of the previous shuffle (quirk Q5).
    # "epoch": sane shuffled-epoch iteration (default for new work).
    batching: str = "epoch"
    eval_fanouts: Optional[Sequence[Optional[int]]] = None  # None = no sampling at eval
    log_every: int = 1
    # Steps executed per device dispatch (lax.scan block). Host<->device
    # dispatch costs ~28 ms under the axon relay, so per-step dispatch
    # (steps_per_dispatch=1) makes wall-clock ~50x worse at Cora scale;
    # per-step loss lines are still printed (from the block's loss array).
    steps_per_dispatch: int = 50
    # Training objective. "supervised" = the reference's cross-entropy on
    # labels (model.py:35-37). "unsupervised" = the GraphSAGE paper's
    # graph-context loss (random-walk positives + degree^0.75 negatives;
    # models/unsupervised.py) — labels are used only by the linear-probe
    # evaluation, never by the training gradient.
    objective: str = "supervised"
    walk_length: int = 3  # positive-pair walk length (unsupervised only)
    num_negatives: int = 10  # Q negatives per seed (unsupervised only)
    neg_power: float = 0.75  # degree smoothing for the negative table

    def __post_init__(self):
        if self.objective not in ("supervised", "unsupervised"):
            # A typo here would otherwise silently train SUPERVISED (labels
            # in the gradient of a run the user believes is label-free).
            raise ValueError(
                f"unknown objective {self.objective!r} — expected "
                "'supervised' or 'unsupervised'"
            )
        if self.objective == "unsupervised":
            if self.walk_length < 1:
                # walk_length=0 masks every positive pair: the loss pins at
                # a gradient-free 0.0 and the run silently trains nothing.
                raise ValueError("unsupervised training needs walk_length >= 1")
            if self.num_negatives < 1:
                raise ValueError("unsupervised training needs num_negatives >= 1")


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str
    dataset: str  # "cora" | "pubmed" | "powerlaw" | path handled by caller
    model: ModelConfig = ModelConfig()
    train: TrainConfig = TrainConfig()

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(text: str) -> "ExperimentConfig":
        raw = json.loads(text)
        m = dict(raw.get("model", {}))
        m["hidden_dims"] = tuple(m.get("hidden_dims", (128, 128)))
        m["fanouts"] = tuple(m.get("fanouts", (10, 10)))
        t = dict(raw.get("train", {}))
        if t.get("eval_fanouts") is not None:
            t["eval_fanouts"] = tuple(t["eval_fanouts"])
        return ExperimentConfig(
            name=raw["name"],
            dataset=raw["dataset"],
            model=ModelConfig(**m),
            train=TrainConfig(**t),
        )


# BASELINE.json configs as presets.
PRESETS: dict[str, ExperimentConfig] = {
    # Reference run_cora shipped behavior: 2-layer mean, effective fanout
    # 10/10 (quirk Q1), hidden 128, 7 classes, 100x256 steps, SGD lr 0.7.
    "cora": ExperimentConfig(
        name="cora",
        dataset="cora",
        model=ModelConfig(hidden_dims=(128, 128), fanouts=(10, 10)),
        # The reference evaluates WITH sampling (enc.num_sample stays 10 at
        # eval, SURVEY.md §3.3), so the preset's printed Validation F1 is the
        # reference's observable; deterministic full-graph eval stays the
        # framework default (eval_fanouts=None) for non-preset configs.
        train=TrainConfig(batch_size=256, num_steps=100, eval_fanouts=(10, 10)),
    ),
    # Reference intent (the dead attribute's values): fanouts 5/5.
    "cora_intent": ExperimentConfig(
        name="cora_intent",
        dataset="cora",
        model=ModelConfig(hidden_dims=(128, 128), fanouts=(5, 5)),
        train=TrainConfig(batch_size=256, num_steps=100, eval_fanouts=(5, 5)),
    ),
    # Reference run_pubmed: 200x1024 steps; intended fanouts 10/25.
    "pubmed": ExperimentConfig(
        name="pubmed",
        dataset="pubmed",
        model=ModelConfig(hidden_dims=(128, 128), fanouts=(10, 25)),
        train=TrainConfig(batch_size=1024, num_steps=200, eval_fanouts=(10, 25)),
    ),
    # Pubmed with the shared-table layer 0 — the measured winner on this
    # shape (3.0 vs 3.6 ms/step, docs/ROOFLINE.md §5: E=89K slots beats the
    # 256K sampled deepest-hop rows); identical converged loss.
    "pubmed_layer0_full": ExperimentConfig(
        name="pubmed_layer0_full",
        dataset="pubmed",
        model=ModelConfig(hidden_dims=(128, 128), fanouts=(10, 25),
                          layer0="full"),
        train=TrainConfig(batch_size=1024, num_steps=200,
                          eval_fanouts=(10, 25)),
    ),
    # Pubmed with the CACHED layer 0 (frozen-feature precompute,
    # ROOFLINE §5.1b): the deepest hop's full-neighborhood mean D^-1 A X is
    # built once at trainer init, so the per-step 256K-row gather + backward
    # scatter AND the per-step full-graph pass of layer0="full" both vanish.
    # Exact reference num_sample=None semantics at the input-closest layer.
    "pubmed_layer0_cached": ExperimentConfig(
        name="pubmed_layer0_cached",
        dataset="pubmed",
        model=ModelConfig(hidden_dims=(128, 128), fanouts=(10, 25),
                          layer0="cached"),
        train=TrainConfig(batch_size=1024, num_steps=200,
                          eval_fanouts=(10, 25)),
    ),
    # Unsupervised GraphSAGE on the Cora shape (framework extension — the
    # reference is supervised-only): graph-context loss, adam, linear-probe
    # eval. SGD lr 0.7 is far too hot for the sigmoid-dot objective.
    "cora_unsup": ExperimentConfig(
        name="cora_unsup",
        dataset="cora",
        model=ModelConfig(hidden_dims=(128, 128), fanouts=(10, 10),
                          final_activation="linear"),
        train=TrainConfig(
            batch_size=256, num_steps=150, optimizer="adam",
            learning_rate=0.01, objective="unsupervised",
            walk_length=3, num_negatives=10, log_every=10,
        ),
    ),
    # LSTM aggregator on Cora (paper §3.3 family completion — neither in the
    # reference nor in BASELINE; adam because the recurrent gates are far
    # more step-size sensitive than the mean/pool projections).
    "cora_lstm": ExperimentConfig(
        name="cora_lstm",
        dataset="cora",
        model=ModelConfig(
            hidden_dims=(128, 128), fanouts=(10, 10), aggregator="lstm",
            pool_dim=128, concat_self=True,
        ),
        train=TrainConfig(
            batch_size=256, num_steps=100, optimizer="adam",
            learning_rate=0.005, eval_fanouts=(10, 10),
        ),
    ),
    # BASELINE config #3: pooling aggregator on Cora.
    "cora_pool": ExperimentConfig(
        name="cora_pool",
        dataset="cora",
        model=ModelConfig(
            hidden_dims=(128, 128), fanouts=(10, 10), aggregator="maxpool",
            pool_dim=128, concat_self=True,
        ),
        train=TrainConfig(batch_size=256, num_steps=100, learning_rate=0.1),
    ),
    # BASELINE config #4: synthetic power-law scaling run (3-layer mean).
    "powerlaw": ExperimentConfig(
        name="powerlaw",
        dataset="powerlaw",
        model=ModelConfig(
            hidden_dims=(256, 256, 256), fanouts=(5, 10, 15),
            compute_dtype="bfloat16",
        ),
        train=TrainConfig(batch_size=4096, num_steps=50, learning_rate=0.1,
                          eval_fanouts=(5, 10, 15)),
    ),
    # BASELINE config #4 at FULL scale: 1M nodes / 20M directed edge slots,
    # 3-layer mean (the shape round 1 only measured ad hoc in ROOFLINE).
    "powerlaw_1m": ExperimentConfig(
        name="powerlaw_1m",
        dataset="powerlaw_1m",
        model=ModelConfig(
            hidden_dims=(256, 256, 256), fanouts=(5, 10, 15),
            compute_dtype="bfloat16",
        ),
        train=TrainConfig(batch_size=4096, num_steps=30, learning_rate=0.1,
                          log_every=10, eval_fanouts=(5, 10, 15)),
    ),
    # The 1M flagship with the cached layer 0: the 38 ms deepest-hop gather
    # and the deepest sampling hop disappear (ROOFLINE §5.1b) — the fastest
    # exact-expectation configuration of this shape on one chip.
    "powerlaw_1m_layer0_cached": ExperimentConfig(
        name="powerlaw_1m_layer0_cached",
        dataset="powerlaw_1m",
        model=ModelConfig(
            hidden_dims=(256, 256, 256), fanouts=(5, 10, 15),
            compute_dtype="bfloat16", layer0="cached",
        ),
        train=TrainConfig(batch_size=4096, num_steps=30, learning_rate=0.1,
                          log_every=10, eval_fanouts=(5, 10, 15)),
    ),
    # BASELINE config #5: Reddit-scale supervised GraphSAGE (232K nodes,
    # ~11.6M directed slots, 602 feats, 41 classes; GraphSAGE-paper-style
    # fanouts 25/10 and 512-seed batches). Synthetic stand-in in-sandbox;
    # multi-host runs shard it with the halo partition / feature store.
    "reddit": ExperimentConfig(
        name="reddit",
        dataset="reddit",
        model=ModelConfig(
            hidden_dims=(128, 128), fanouts=(10, 25),
            compute_dtype="bfloat16",
        ),
        train=TrainConfig(batch_size=512, num_steps=100, learning_rate=0.1,
                          log_every=20, eval_fanouts=(10, 25)),
    ),
}
