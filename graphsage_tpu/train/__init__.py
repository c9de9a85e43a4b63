from graphsage_tpu.train.config import ExperimentConfig, ModelConfig, TrainConfig, PRESETS
from graphsage_tpu.train.trainer import Trainer, TrainState

__all__ = [
    "ExperimentConfig",
    "ModelConfig",
    "TrainConfig",
    "PRESETS",
    "Trainer",
    "TrainState",
]
