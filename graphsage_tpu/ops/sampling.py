"""Vectorized fixed-fanout neighbor sampling.

Replaces the reference's per-node Python loop — ~1130 ``random.sample`` calls
per training step (reference graphsage/aggregators.py:38-44, SURVEY.md §3.2) —
with one batched gather + top-k that compiles to static-shape TPU ops.

Semantics are pinned to the reference's (SURVEY.md quirk Q8):

* uniform, **without replacement**;
* exactly ``min(degree, fanout)`` distinct neighbors per node — when a node
  has fewer neighbors than the fanout, *all* of them are taken (no resampling,
  no duplicate padding), and the aggregation denominator is the valid count;
* ``fanout=None`` disables sampling and returns the full (padded) row — the
  deterministic path used for numerical-parity testing (quirk Q7);
* zero-degree nodes yield a fully-masked row; downstream means are guarded
  (``sum / max(count, 1)``) instead of reproducing the reference's 0/0 NaN
  (quirk Q4 — an intentional, documented divergence).

Mechanism: draw one uniform key per padded neighbor slot, force padding slots
to ``-1``, and take the top-``fanout`` keys. A uniform random key order is a
uniform random permutation, so the selected slots are a uniform
without-replacement draw; validity survives as ``key >= 0``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _slot_validity(degrees: jax.Array, width: int) -> jax.Array:
    """mask[..., width]: slot j is a real neighbor iff j < degree."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (*degrees.shape, width), len(degrees.shape))
    return iota < degrees[..., None]


def full_neighbors(
    neighbors: jax.Array,
    degrees: jax.Array,
    nodes: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """No-sampling path: every neighbor, padded to ``max_degree``.

    Returns ``(ids[..., max_degree] int32, mask[..., max_degree] bool)``.
    """
    rows = neighbors[nodes]
    mask = _slot_validity(degrees[nodes], neighbors.shape[-1])
    return rows, mask


def sample_neighbors(
    key: jax.Array,
    neighbors: jax.Array,
    degrees: jax.Array,
    nodes: jax.Array,
    fanout: int | None,
) -> tuple[jax.Array, jax.Array]:
    """Sample up to ``fanout`` neighbors for each node in ``nodes``.

    Args:
      key: PRNG key.
      neighbors: padded neighbor table ``[N, max_degree]`` (ELL view).
      degrees: true row lengths ``[N]``.
      nodes: node ids of any shape ``[...]``.
      fanout: neighbors to draw per node; ``None`` = all (deterministic).

    Returns:
      ``ids[..., k]`` int32 and ``mask[..., k]`` bool with
      ``k = fanout`` (or ``max_degree`` when ``fanout`` is ``None``).
      Exactly ``min(degree, fanout)`` mask entries are True per row.
    """
    if fanout is None:
        return full_neighbors(neighbors, degrees, nodes)

    max_deg = neighbors.shape[-1]
    rows = neighbors[nodes]  # [..., max_deg]
    valid = _slot_validity(degrees[nodes], max_deg)

    if fanout >= max_deg:
        # Every valid slot fits; pad the row out to the requested width.
        pad = fanout - max_deg
        ids = jnp.pad(rows, [(0, 0)] * (rows.ndim - 1) + [(0, pad)])
        mask = jnp.pad(valid, [(0, 0)] * (valid.ndim - 1) + [(0, pad)])
        return ids, mask

    keys = jax.random.uniform(key, rows.shape, minval=0.0, maxval=1.0)
    scored = jnp.where(valid, keys, -1.0)
    top_vals, top_slots = jax.lax.top_k(scored, fanout)
    ids = jnp.take_along_axis(rows, top_slots, axis=-1)
    mask = top_vals >= 0.0
    return ids, mask
