"""Random walks and negative sampling for the unsupervised objective.

The reference repo trains supervised-only (reference graphsage/model.py:35-37
— cross-entropy on labels); the GraphSAGE paper's other training mode is the
unsupervised graph-context loss (Hamilton et al. 2017, eq. 1): nodes that
co-occur on short random walks are pulled together, against ``Q`` negatives
drawn from a smoothed degree distribution. These are the TPU-native sampling
primitives for it:

* :func:`random_walk` — batched fixed-length uniform random walks as ``L``
  unrolled single-fanout neighbor draws (reusing :func:`sample_neighbors`, so
  hub-capped ELL rows resolve through CSR exactly like training-time
  sampling). Static ``[B, L+1]`` shape; a walk that hits a sink (zero
  out-degree) stays put and is masked from there on.
* :func:`positive_pairs` — one co-occurrence partner per seed: a uniformly
  chosen visited step of that seed's walk (word2vec-style context with the
  window equal to the walk).
* :func:`negative_cdf` / :func:`sample_from_cdf` — ``degree**0.75`` unigram
  negative table as an inverse-CDF lookup: the CDF is one ``[N]`` f32 array
  built host-side at trainer init, and each draw is a batched
  ``searchsorted`` (O(log N) per sample, static shapes) instead of an
  O(B*N) categorical over the node set.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from graphsage_tpu.data.graph import Graph
from graphsage_tpu.ops.sampling import sample_neighbors


def random_walk(
    key: jax.Array, graph: Graph, starts: jax.Array, length: int
) -> tuple[jax.Array, jax.Array]:
    """Uniform random walks of ``length`` steps from ``starts``.

    Returns ``(walks [B, length+1] int32, valid [B, length+1] bool)``.
    ``walks[:, 0] = starts`` (always valid); step ``t`` is a uniformly
    sampled neighbor of step ``t-1``. When a walk reaches a node with no
    neighbors it stays there with ``valid=False`` for that and all later
    steps — shapes stay static, downstream consumers mask.
    """
    starts = starts.astype(jnp.int32)
    keys = jax.random.split(key, max(length, 1))
    cur = starts
    alive = jnp.ones(starts.shape, bool)
    steps = [starts]
    flags = [alive]
    for t in range(length):
        ids, mask = sample_neighbors(
            keys[t],
            graph.neighbors,
            graph.degrees,
            cur,
            fanout=1,
            indptr=graph.indptr,
            edge_dst=graph.edge_dst,
            ell_covers_all=graph.ell_covers_all,
        )
        step_ok = alive & mask[..., 0]
        cur = jnp.where(step_ok, ids[..., 0], cur)
        alive = step_ok
        steps.append(cur)
        flags.append(alive)
    return jnp.stack(steps, axis=-1), jnp.stack(flags, axis=-1)


def positive_pairs(
    key: jax.Array, graph: Graph, seeds: jax.Array, walk_length: int
) -> tuple[jax.Array, jax.Array]:
    """One random-walk co-occurrence partner per seed.

    Runs a ``walk_length`` walk from each seed and picks one visited step
    uniformly (revisited nodes count once per visit — word2vec-style
    co-occurrence weighting). Returns ``(pos [B] int32, mask [B] bool)``;
    isolated seeds (no valid step at all) return themselves with
    ``mask=False`` so the loss can drop the pair without dynamic shapes.
    """
    walk_key, pick_key = jax.random.split(key)
    walks, valid = random_walk(walk_key, graph, seeds, walk_length)
    return pick_positive_step(pick_key, walks, valid, seeds)


def pick_positive_step(
    pick_key: jax.Array, walks: jax.Array, valid: jax.Array, seeds: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Uniform choice among a walk's visited steps (shared by the
    replicated and the distributed walk paths — identical pick math is what
    keeps their pair semantics aligned)."""
    visited, ok = walks[..., 1:], valid[..., 1:]
    # Valid steps form a prefix (a dead walk never revives), so a uniform
    # index below the count is a uniform choice among valid steps.
    count = ok.sum(axis=-1)
    u = jax.random.uniform(pick_key, count.shape)
    idx = jnp.minimum(
        (u * count.astype(u.dtype)).astype(jnp.int32),
        jnp.maximum(count - 1, 0),
    )
    pos = jnp.take_along_axis(visited, idx[..., None], axis=-1)[..., 0]
    mask = count > 0
    return jnp.where(mask, pos, seeds.astype(jnp.int32)), mask


def negative_cdf(degrees: np.ndarray, power: float = 0.75) -> np.ndarray:
    """Inverse-CDF table for smoothed-degree negative sampling.

    ``P(v) ∝ degree(v)**power`` (the word2vec unigram smoothing the GraphSAGE
    paper adopts). Host-side, built once; f64 cumsum so the 1M-node tail
    doesn't lose mass to f32 rounding, stored f32 for the device lookup.
    Falls back to uniform when every degree is zero (edgeless graph).
    """
    w = np.asarray(degrees, np.float64) ** power
    total = w.sum()
    if total <= 0:
        w = np.ones_like(w)
        total = w.sum()
    cdf = np.cumsum(w / total)
    cdf[-1] = 1.0  # guard rounding so u < 1 always lands in range
    return cdf.astype(np.float32)


def sample_from_cdf(key: jax.Array, cdf: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    """Draw node ids i.i.d. from the distribution encoded by ``cdf``."""
    u = jax.random.uniform(key, shape)
    idx = jnp.searchsorted(cdf, u, side="right")
    return jnp.minimum(idx, cdf.shape[0] - 1).astype(jnp.int32)
