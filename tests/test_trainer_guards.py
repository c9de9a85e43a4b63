"""Trainer misconfiguration guards."""

import pytest

from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.train.config import TrainConfig
from graphsage_tpu.train.trainer import Trainer


def test_empty_train_split_raises():
    graph = power_law_graph(num_nodes=100, num_edges=300, num_feats=8, num_classes=3)
    model = GraphSAGE(in_dim=8, num_classes=3, hidden_dims=(4,), fanouts=(2,))
    with pytest.raises(ValueError, match="empty train split"):
        Trainer(model, graph, TrainConfig(test_size=80, val_size=40))


def test_unknown_batching_mode_raises():
    graph = power_law_graph(num_nodes=100, num_edges=300, num_feats=8, num_classes=3)
    model = GraphSAGE(in_dim=8, num_classes=3, hidden_dims=(4,), fanouts=(2,))
    trainer = Trainer(model, graph, TrainConfig(
        test_size=20, val_size=20, batching="bogus"))
    with pytest.raises(ValueError, match="unknown batching"):
        next(trainer.batches())


def test_diagnose_context_runs_and_falls_back():
    """The failure-diagnostics wrapper (SURVEY §5.3) must run its block
    both with the real collector and with the no-op fallback."""
    import sys
    import warnings
    from unittest import mock

    from graphsage_tpu.utils import diagnostics

    ran = []
    with diagnostics.diagnose(hang_interval_seconds=600):
        ran.append(1)
    assert ran == [1]

    with mock.patch.dict(sys.modules, {"cloud_tpu_diagnostics": None}):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            with diagnostics.diagnose():
                ran.append(2)
    assert ran == [1, 2]
