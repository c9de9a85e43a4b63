"""Device-mesh construction and canonical PartitionSpecs.

The reference is single-process/single-device with no communication layer
(SURVEY.md §2.2). This module is the framework's NCCL-equivalent: JAX meshes
over ICI/DCN with named axes, and the sharding rules the rest of the
framework uses.

Axes:

* ``data``  — data parallelism: the seed-node batch is split; gradients
  all-reduce (psum) across it.
* ``model`` — tensor parallelism over the feature dimension: ``features
  [N, F]`` and the first layer weight ``[F, d]`` are sharded on ``F``; the
  contraction inserts one all-reduce per layer-1 matmul.
* ``graph`` — edge partitioning for full-graph aggregation: each shard owns a
  contiguous CSR edge block, computes partial segment-sums, and partials
  all-reduce (the graph analog of sequence parallelism — SURVEY.md §5.7).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_sizes: dict[str, int] | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a mesh; default = all local devices on a single ``data`` axis."""
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = {"data": len(devices)}
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes.values())
    total = math.prod(sizes)
    if total > len(devices):
        raise ValueError(
            f"mesh {dict(axis_sizes)} needs {total} devices, have {len(devices)}"
        )
    grid = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(grid, names)


def default_mesh_shape(n_devices: int) -> dict[str, int]:
    """(data, model) factorization used by the dry-run harness: largest
    power-of-two model axis up to 4, remainder on data."""
    model = 1
    for cand in (4, 2):
        if n_devices % cand == 0:
            model = cand
            break
    return {"data": n_devices // model, "model": model}


def named(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def graph_shardings(mesh: Mesh, graph, model_axis: str | None = "model"):
    """NamedShardings pytree (matching ``graph``'s structure) for DP+TP.

    Features shard on the feature dim over the model axis; adjacency, labels
    and edge arrays replicate (they are index data read by every shard).
    """
    model_axis = model_axis if model_axis in mesh.axis_names else None
    repl = named(mesh)
    feat_sharding = named(mesh, None, model_axis)
    # ``features`` may be a QuantizedTable subtree: its q [N, F] splits on
    # the feature dim like a dense table, but the [N, 1] per-row scale
    # column has nothing to split — it replicates.
    feat_ids = {
        id(leaf) for leaf in jax.tree_util.tree_leaves(graph.features)
    }
    return jax.tree_util.tree_map(
        lambda leaf: (
            feat_sharding
            if id(leaf) in feat_ids and leaf.ndim == 2 and leaf.shape[1] > 1
            else repl
        ),
        graph,
    )


def param_shardings(mesh: Mesh, params, in_dim: int, model_axis: str | None = "model"):
    """NamedShardings for SAGEParams: tensor parallelism is *explicit
    per-layer placement* — ONLY layer 0's weights (the ones contracting over
    the feature dim that ``graph_shardings`` splits) are sharded on the
    model axis; every deeper layer and the head replicate.

    The previous shape heuristic ("shard any 2-D weight whose shape[0] is
    in_dim or 2*in_dim") silently sharded *every* layer when
    ``in_dim == hidden`` (e.g. the powerlaw preset, F=128=hidden) —
    semantically fine under NamedSharding but different from the documented
    design with unmeasured collective cost. ``in_dim`` is kept for API
    compatibility but placement no longer depends on shape matching.
    """
    del in_dim  # placement is structural, not shape-matched
    model_axis = model_axis if model_axis in mesh.axis_names else None
    repl = named(mesh)
    row_sharded = named(mesh, model_axis, None) if model_axis else repl

    def layer_spec(i, lp):
        if model_axis is None or i != 0:
            return jax.tree_util.tree_map(lambda _: repl, lp)
        # Layer 0: weight [F or 2F, d] and pool_weight [F, pd] contract over
        # the sharded feature dim -> shard dim 0; pool_bias replicates.
        return type(lp)(
            weight=row_sharded,
            pool_weight=None if lp.pool_weight is None else row_sharded,
            pool_bias=None if lp.pool_bias is None else repl,
        )

    return type(params)(
        layers=tuple(layer_spec(i, lp) for i, lp in enumerate(params.layers)),
        head=repl,
    )
