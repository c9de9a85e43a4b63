from graphsage_tpu.models.layers import (
    SAGELayerParams,
    apply_sage_layer,
    init_sage_layer,
    masked_lstm,
)
from graphsage_tpu.models.graphsage import GraphSAGE, SAGEParams, Frontier

__all__ = [
    "SAGELayerParams",
    "init_sage_layer",
    "apply_sage_layer",
    "masked_lstm",
    "GraphSAGE",
    "SAGEParams",
    "Frontier",
]
