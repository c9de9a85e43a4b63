"""Supervised GraphSAGE on Cora — the reference's run_cora, TPU-native.

    python examples/01_train_cora.py [--data-root cora/]

Without --data-root a full-shape synthetic Cora is generated (the real
LINQS files drop in unchanged). Mirrors reference graphsage/model.py
run_cora: 2-layer mean aggregator, fanout 10/10, SGD lr 0.7, 100x256.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere

import argparse
import sys
import tempfile

import graphsage_tpu as gt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", default=None)
    p.add_argument("--steps", type=int, default=100)
    args = p.parse_args(argv)

    root = args.data_root
    if root is None:
        from graphsage_tpu.data.synthetic import synth_cora_files

        root = synth_cora_files(tempfile.mkdtemp(), seed=0)
        print(f"(no --data-root: generated synthetic Cora at {root})")

    graph = gt.load_cora(root)
    model = gt.GraphSAGE(
        in_dim=graph.num_features, num_classes=graph.num_classes,
        hidden_dims=(128, 128), fanouts=(10, 10),
    )
    trainer = gt.Trainer(
        model, graph,
        gt.TrainConfig(num_steps=args.steps, batch_size=256, log_every=20),
    )
    result = trainer.run()
    print(f"validation micro-F1: {result['val_micro_f1']:.4f}")
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
