"""Evaluation metrics, implemented in numpy/jnp (no sklearn dependency on the
device path).

The reference reports sklearn ``f1_score(average="micro")`` over the 500-node
validation split (reference graphsage/model.py:105). For single-label
multi-class prediction, micro-F1 is exactly accuracy; macro-F1 is also
provided for richer reporting.
"""

from __future__ import annotations

import numpy as np


def accuracy(y_true, y_pred) -> float:
    y_true = np.asarray(y_true).reshape(-1)
    y_pred = np.asarray(y_pred).reshape(-1)
    if y_true.size == 0:
        return 0.0
    return float((y_true == y_pred).mean())


def micro_f1(y_true, y_pred) -> float:
    """Micro-averaged F1. Equals accuracy in single-label multi-class."""
    return accuracy(y_true, y_pred)


def macro_f1(y_true, y_pred, num_classes: int | None = None) -> float:
    y_true = np.asarray(y_true).reshape(-1)
    y_pred = np.asarray(y_pred).reshape(-1)
    if num_classes is None:
        num_classes = int(max(y_true.max(initial=0), y_pred.max(initial=0))) + 1
    f1s = []
    for c in range(num_classes):
        tp = np.sum((y_pred == c) & (y_true == c))
        fp = np.sum((y_pred == c) & (y_true != c))
        fn = np.sum((y_pred != c) & (y_true == c))
        denom = 2 * tp + fp + fn
        f1s.append(2 * tp / denom if denom else 0.0)
    return float(np.mean(f1s))
