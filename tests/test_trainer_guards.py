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
