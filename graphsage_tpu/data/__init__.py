from graphsage_tpu.data.graph import Graph, build_graph, disjoint_union
from graphsage_tpu.data.loaders import load_cora, load_pubmed
from graphsage_tpu.data.synthetic import (
    synth_cora_files,
    synth_pubmed_files,
    power_law_graph,
    synthetic_ppi_graphs,
)

__all__ = [
    "Graph",
    "build_graph",
    "disjoint_union",
    "load_cora",
    "load_pubmed",
    "synth_cora_files",
    "synth_pubmed_files",
    "power_law_graph",
    "synthetic_ppi_graphs",
]
