"""graphsage_tpu — a TPU-native GraphSAGE framework built from scratch in JAX.

Not a port of the PyTorch reference (zjzijielu/graphsage-simple): the reference's
dict-of-sets adjacency, per-node Python sampling loops and dense mask matmuls
(reference graphsage/aggregators.py:30-65) are replaced by padded static-shape
device arrays, vectorized fixed-fanout sampling, and segment/gather aggregation
kernels (XLA + Pallas), trained by a jit/pjit step over a `jax.sharding.Mesh`.

Top-level re-exports cover the common surface; submodules hold the rest:

  data      — Graph container, Cora/Pubmed loaders, synthetic generators
  ops       — samplers, aggregators, Pallas kernels
  models    — GraphSAGE layers + supervised classifier
  parallel  — mesh / sharding / edge-partitioned distributed aggregation
  train     — configs, trainer, reference-parity experiment presets
  utils     — metrics, checkpointing, profiling
"""

from graphsage_tpu.data.graph import (
    Graph,
    build_graph,
    disjoint_union,
    induced_subgraph,
    quantize_graph,
    relabel_graph,
    with_cached_layer0,
)
from graphsage_tpu.ops.quantize import QuantizedTable, dequantize, quantize_features
from graphsage_tpu.data.loaders import (
    load_cora,
    load_cora_lazy,
    load_pubmed,
    load_pubmed_lazy,
)
from graphsage_tpu.models.graphsage import GraphSAGE, SAGEParams
from graphsage_tpu.parallel.distributed import ShardedTrainer
from graphsage_tpu.parallel.feature_store import (
    FullyShardedTrainer,
    ShardedFeatureTrainer,
    build_hub_cache,
    hub_request_fraction,
    shard_features_from_loader,
    sharded_comm_stats,
)
from graphsage_tpu.parallel.halo import (
    auto_partition_plan,
    build_node_partition,
    locality_relabel,
)
from graphsage_tpu.parallel.mesh import make_mesh
from graphsage_tpu.serve import ServingEngine
from graphsage_tpu.train.config import ExperimentConfig, ModelConfig, TrainConfig
from graphsage_tpu.train.experiments import run_cora, run_preset, run_pubmed
from graphsage_tpu.train.full_graph import FullGraphTrainer
from graphsage_tpu.train.trainer import Trainer, TrainState
from graphsage_tpu.train.unsupervised import (
    UnsupervisedFullyShardedTrainer,
    UnsupervisedShardedTrainer,
    UnsupervisedTrainer,
)

__version__ = "0.1.0"

__all__ = [
    "Graph",
    "build_graph",
    "relabel_graph",
    "quantize_graph",
    "with_cached_layer0",
    "induced_subgraph",
    "disjoint_union",
    "QuantizedTable",
    "quantize_features",
    "dequantize",
    "locality_relabel",
    "load_cora",
    "load_pubmed",
    "load_cora_lazy",
    "load_pubmed_lazy",
    "shard_features_from_loader",
    "GraphSAGE",
    "SAGEParams",
    "ExperimentConfig",
    "ModelConfig",
    "TrainConfig",
    "Trainer",
    "UnsupervisedTrainer",
    "UnsupervisedShardedTrainer",
    "UnsupervisedFullyShardedTrainer",
    "FullGraphTrainer",
    "ShardedTrainer",
    "ShardedFeatureTrainer",
    "build_hub_cache",
    "hub_request_fraction",
    "FullyShardedTrainer",
    "sharded_comm_stats",
    "auto_partition_plan",
    "build_node_partition",
    "make_mesh",
    "ServingEngine",
    "TrainState",
    "run_cora",
    "run_pubmed",
    "run_preset",
    "__version__",
]
