"""Request serving: the table tier.

    python examples/04_serving.py

Train briefly, stand up a ServingEngine, serve requests. Table mode
refreshes an [N, d_L] embedding table once per parameter update; each
request is one row gather + head matmul (no sampling on the request
path). See docs/SERVING.md for the sharded and int8 tiers.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere

import sys
import tempfile

import numpy as np

import graphsage_tpu as gt


def main(argv=None):
    from graphsage_tpu.data.synthetic import synth_cora_files

    root = synth_cora_files(tempfile.mkdtemp(), seed=0)
    graph = gt.load_cora(root)
    model = gt.GraphSAGE(in_dim=graph.num_features,
                         num_classes=graph.num_classes,
                         hidden_dims=(128, 128), fanouts=(10, 10))
    trainer = gt.Trainer(model, graph,
                         gt.TrainConfig(num_steps=40, log_every=0))
    state = trainer.init_state()
    batches = trainer.batches()
    for _ in range(40):
        state, _ = trainer.step(state, next(batches))

    engine = gt.ServingEngine(model, graph, state.params, mode="table",
                              batch_buckets=(256,))
    nodes = np.arange(10)
    print("predictions:", engine.predict(nodes))
    print("embedding shape:", engine.embed(nodes).shape)
    # New parameters? One refresh call re-embeds the graph.
    engine.refresh(state.params)
    return engine


if __name__ == "__main__":
    main(sys.argv[1:])
