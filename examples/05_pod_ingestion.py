"""Pod-scale ingestion: no host ever materializes the full feature table.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/05_pod_ingestion.py

load_cora_lazy records byte offsets instead of parsing feature columns;
shard_features_from_loader asks the row loader only for the rows THIS
process's devices own (native C++ range parsers when built). On an
M-process pod each host parses N/M rows — docs/DISTRIBUTED.md.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere

import sys
import tempfile

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

import graphsage_tpu as gt


def main(argv=None):
    from graphsage_tpu.data.synthetic import synth_cora_files

    root = synth_cora_files(tempfile.mkdtemp(), seed=0)
    graph, row_loader = gt.load_cora_lazy(root)
    print(f"graph: {graph.num_nodes} nodes; feature leaf is a descriptor "
          f"(strides {graph.features.strides})")

    s = len(jax.devices())
    mesh = gt.make_mesh({"data": s})
    store = gt.shard_features_from_loader(
        row_loader, graph.num_nodes, graph.num_features, s,
        NamedSharding(mesh, P("data")),
    )
    model = gt.GraphSAGE(in_dim=graph.num_features,
                         num_classes=graph.num_classes,
                         hidden_dims=(64, 64), fanouts=(5, 5))
    cfg = gt.TrainConfig(batch_size=8 * s, num_steps=10, log_every=5,
                         eval_fanouts=(5, 5))
    trainer = gt.ShardedFeatureTrainer(model, graph, cfg, mesh,
                                       feature_store=store)
    result = trainer.run()
    print(f"val F1: {result['val_micro_f1']:.4f}  "
          f"(feature bytes/chip: {trainer.memory_stats()['feature_bytes_per_chip']})")
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
