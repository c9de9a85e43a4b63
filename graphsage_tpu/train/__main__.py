"""CLI entry: ``python -m graphsage_tpu.train --preset cora --data-root cora``.

The TPU-native counterpart of the reference's ``python -m graphsage.model``
(reference model.py:180-184), with the hyperparameters that were hardcoded
there exposed as flags.
"""

from graphsage_tpu.train.experiments import main

if __name__ == "__main__":
    main()
