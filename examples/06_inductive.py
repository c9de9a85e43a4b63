"""Inductive inference: apply trained parameters to nodes that did not
exist at training time — the GraphSAGE paper's headline capability.

    python examples/06_inductive.py

Parameters are graph-independent (forward takes the graph as a runtime
argument), so the deploy loop for a growing graph is: train on today's
graph, serve tomorrow's. The reference cannot express this — its layers
bind the adjacency at construction.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere

import sys

import numpy as np

import graphsage_tpu as gt
from graphsage_tpu.data.graph import induced_subgraph
from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.utils.metrics import micro_f1


def main(argv=None):
    full = power_law_graph(num_nodes=600, num_edges=2400, num_feats=48,
                           num_classes=5, seed=4, homophily=0.9)
    n_seen = 420  # the last 180 nodes "arrive after training"

    today = induced_subgraph(full, np.arange(n_seen))

    model = gt.GraphSAGE(in_dim=48, num_classes=5, hidden_dims=(32, 32),
                         fanouts=(5, 5))
    trainer = gt.Trainer(model, today,
                         gt.TrainConfig(batch_size=64, num_steps=120,
                                        test_size=60, val_size=60,
                                        log_every=0))
    state = trainer.init_state()
    batches = trainer.batches()
    for _ in range(120):
        state, _ = trainer.step(state, next(batches))

    # Tomorrow: same params, the GROWN graph, the new nodes.
    engine = gt.ServingEngine(model, full, state.params, mode="table",
                              batch_buckets=(256,))
    new_nodes = np.arange(n_seen, full.num_nodes)
    preds = engine.predict(new_nodes)
    f1 = micro_f1(np.asarray(full.labels)[new_nodes], preds)
    print(f"micro-F1 on {len(new_nodes)} nodes the model never saw: {f1:.3f} "
          f"(chance 0.200)")
    return f1


if __name__ == "__main__":
    main(sys.argv[1:])
