"""Distributed training on a device mesh.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/03_distributed.py        # 8 virtual CPU devices

On real hardware the same code runs over the TPU mesh unchanged. Shows
the three sampled tiers (docs/DISTRIBUTED.md):
  ShardedTrainer       — data parallel (+ optional tensor parallel)
  ShardedFeatureTrainer— node-sharded feature table (N/S*F per chip)
  FullyShardedTrainer  — adjacency + features + batch all sharded
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere

import sys

import jax
import numpy as np

import graphsage_tpu as gt
from graphsage_tpu.data.synthetic import power_law_graph


def main(argv=None):
    s = len(jax.devices())
    mesh = gt.make_mesh({"data": s})
    # placement="host": the full table never touches a device — each chip
    # receives only its N/S rows.
    graph = power_law_graph(num_nodes=2048, num_edges=8192, num_feats=64,
                            num_classes=7, seed=0, homophily=0.8,
                            placement="host")
    model = gt.GraphSAGE(in_dim=64, num_classes=7, hidden_dims=(64, 64),
                         fanouts=(5, 5))
    cfg = gt.TrainConfig(batch_size=32 * s, num_steps=20, log_every=5,
                         eval_fanouts=(5, 5))

    trainer = gt.FullyShardedTrainer(model, graph, cfg, mesh,
                                     capacity_slack=4.0)
    result = trainer.run()
    stats = trainer.memory_stats()
    print(f"devices: {s}  val F1: {result['val_micro_f1']:.4f}")
    print(f"feature bytes/chip: {stats['feature_bytes_per_chip']} "
          f"(replicated would be {stats['feature_bytes_replicated']})")
    assert np.isfinite(result["losses"]).all()
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
