from graphsage_tpu.models.layers import SAGELayerParams, init_sage_layer, apply_sage_layer
from graphsage_tpu.models.graphsage import GraphSAGE, SAGEParams, Frontier

__all__ = [
    "SAGELayerParams",
    "init_sage_layer",
    "apply_sage_layer",
    "GraphSAGE",
    "SAGEParams",
    "Frontier",
]
