"""Unsupervised GraphSAGE: the paper's graph-context loss + linear probe.

    python examples/02_unsupervised.py

Random-walk positive pairs, degree^0.75 negatives, L2-normalized
embeddings; labels only ever reach the probe (never the gradient).
The reference trains supervised-only — this is the paper's other mode.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere

import sys
import tempfile

import graphsage_tpu as gt


def main(argv=None):
    from graphsage_tpu.data.synthetic import synth_cora_files

    root = synth_cora_files(tempfile.mkdtemp(), seed=0)
    graph = gt.load_cora(root)
    model = gt.GraphSAGE(
        in_dim=graph.num_features, num_classes=graph.num_classes,
        hidden_dims=(128, 128), fanouts=(10, 10),
        final_activation="linear",   # required: see GraphSAGE docstring
    )
    trainer = gt.UnsupervisedTrainer(
        model, graph,
        gt.TrainConfig(
            objective="unsupervised", optimizer="adam", learning_rate=0.01,
            num_steps=int((argv or ["60"])[0]), batch_size=256,
            walk_length=3, num_negatives=10, log_every=10,
        ),
    )
    result = trainer.run()
    print(f"linear-probe validation micro-F1: {result['val_micro_f1']:.4f}")
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
