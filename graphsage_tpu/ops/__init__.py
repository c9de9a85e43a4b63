from graphsage_tpu.ops.sampling import sample_neighbors, full_neighbors
from graphsage_tpu.ops.aggregate import (
    masked_mean,
    masked_max,
    gather,
    spmm_mean,
    segment_mean_csr,
)

__all__ = [
    "sample_neighbors",
    "full_neighbors",
    "masked_mean",
    "masked_max",
    "gather",
    "spmm_mean",
    "segment_mean_csr",
]
