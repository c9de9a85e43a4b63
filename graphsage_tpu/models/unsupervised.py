"""Unsupervised GraphSAGE: graph-context loss and the linear-probe readout.

The reference trains supervised-only (reference graphsage/model.py:35-37);
this module adds the GraphSAGE paper's other objective (Hamilton et al. 2017,
eq. 1):

    J(z_u) = -log σ(z_u·z_v) - Q · E_{v_n~P_n} log σ(-z_u·z_{v_n})

with v a random-walk co-occurrence of u and P_n the degree^0.75 negative
distribution (ops/walks.py). TPU shape: the seeds, their positives, and all
``B·Q`` negatives are embedded in ONE sampled forward over the concatenated
``[B·(2+Q)]`` seed vector — one frontier, one set of gathers, one MXU pass —
instead of three separate encoder invocations. Everything is static-shape and
jit-safe; the trainer wraps this in the same scanned-block step as the
supervised path.

Evaluation follows the paper's protocol: embeddings are frozen and a linear
(multinomial logistic) probe is trained on the train split — implemented as a
jitted full-batch optax fit, no sklearn.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from graphsage_tpu.data.graph import Graph
from graphsage_tpu.models.graphsage import GraphSAGE, SAGEParams
from graphsage_tpu.ops.walks import positive_pairs, sample_from_cdf


def context_groups(
    key: jax.Array,
    graph: Graph,
    seeds: jax.Array,
    neg_cdf: jax.Array,
    *,
    walk_length: int,
    num_negatives: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """``(group_seeds [B*(2+Q)], pair_mask [B], sample_key)`` for one step.

    Groups are seed-major — ``(u_i, v_i, n_i1..n_iQ)`` contiguous — so a
    leading-axis shard of the flattened vector keeps every group whole
    (what :class:`~graphsage_tpu.train.unsupervised.UnsupervisedShardedTrainer`
    relies on); the single-chip loss uses the identical layout, which is
    what makes N-shard vs 1-chip parity exact.
    """
    b = seeds.shape[0]
    k_pos, k_neg, k_sample = jax.random.split(key, 3)
    pos, pair_mask = positive_pairs(k_pos, graph, seeds, walk_length)
    negs = sample_from_cdf(k_neg, neg_cdf, (b, num_negatives))
    groups = jnp.concatenate(
        [seeds.astype(jnp.int32)[:, None], pos[:, None], negs], axis=1
    )
    return groups.reshape(-1), pair_mask, k_sample


def context_group_scores(
    z: jax.Array, pair_mask: jax.Array, num_negatives: int
) -> tuple[jax.Array, jax.Array]:
    """``(per_seed_loss [G], kept [G])`` over seed-major ``(u, v, n_1..n_Q)``
    embedding groups ``z [G*(2+Q), d]``.

    L2-normalizes first (GraphSAGE Algorithm 1 line 7). This is load-bearing,
    not cosmetic: on raw embeddings the Q negative terms outweigh the single
    positive near init and the cheapest descent is z -> 0 (loss pins at
    (1+Q)*log 2 and the encoder dies — observed). On the unit sphere the
    zero fixed point does not exist and the loss can only move directions.

    The normalization is NaN-safe at exactly-zero rows: an isolated node
    drawn as a seed/positive/negative embeds to exactly 0 (empty
    neighborhoods aggregate to 0, quirk Q4), and the vjp of
    ``jnp.linalg.norm`` at 0 is 0/0 — the pair mask zeroes the loss term
    but NOT the NaN inside the norm's backward, so one isolated seed would
    poison every parameter through adam. Guarding the squared norm keeps
    the gradient exactly 0 through the dead branch (test-pinned).
    """
    sq = jnp.sum(z * z, axis=-1, keepdims=True)
    z = z * jax.lax.rsqrt(jnp.where(sq == 0.0, 1.0, sq))
    z3 = z.reshape(-1, 2 + num_negatives, z.shape[-1])
    zu, zv, zn = z3[:, 0], z3[:, 1], z3[:, 2:]
    pos_score = jnp.sum(zu * zv, axis=-1)
    neg_score = jnp.einsum("bd,bqd->bq", zu, zn)
    per_seed = -jax.nn.log_sigmoid(pos_score) - jnp.sum(
        jax.nn.log_sigmoid(-neg_score), axis=-1
    )
    return per_seed, pair_mask.astype(per_seed.dtype)


def context_group_loss(
    z: jax.Array, pair_mask: jax.Array, num_negatives: int
) -> jax.Array:
    """Masked-mean graph-context loss (single-device reduction). Distributed
    callers reduce :func:`context_group_scores` themselves — the denominator
    must be the GLOBAL pair count and gradients need an explicit psum (the
    transpose of ``psum`` is identity, so per-shard ``grad`` of a
    psum-containing loss yields only the local contribution)."""
    per_seed, kept = context_group_scores(z, pair_mask, num_negatives)
    return jnp.sum(per_seed * kept) / jnp.maximum(jnp.sum(kept), 1.0)


def unsupervised_loss(
    model: GraphSAGE,
    params: SAGEParams,
    graph: Graph,
    key: jax.Array,
    seeds: jax.Array,
    neg_cdf: jax.Array,
    *,
    walk_length: int = 3,
    num_negatives: int = 10,
) -> jax.Array:
    """Mean graph-context loss over the seed batch (single-table path).

    Seeds whose walk found no positive (isolated nodes) are dropped from the
    mean via the pair mask — shapes stay static.
    """
    group_seeds, pair_mask, k_sample = context_groups(
        key, graph, seeds, neg_cdf,
        walk_length=walk_length, num_negatives=num_negatives,
    )
    frontier = model.sample(k_sample, graph, group_seeds)
    z = model.forward(
        params, graph.features, frontier, return_embeddings=True, graph=graph
    )
    return context_group_loss(z, pair_mask, num_negatives)


@partial(jax.jit, static_argnames=("num_classes", "steps"))
def linear_probe_predict(
    train_x: jax.Array,
    train_y: jax.Array,
    eval_x: jax.Array,
    num_classes: int,
    *,
    steps: int = 300,
    lr: float = 0.1,
    l2: float = 1e-4,
) -> jax.Array:
    """Class predictions for ``eval_x`` from a logistic probe fit on
    ``(train_x, train_y)``.

    Full-batch multinomial logistic regression (adam, ``steps`` iterations,
    deterministic zero init), standardized by train-split statistics. The
    whole fit is one compiled scan — at probe scale ([train, d<=256]) this is
    microseconds of MXU time, not a host round-trip per iteration.
    """
    mu = train_x.mean(axis=0)
    sd = train_x.std(axis=0) + 1e-6
    tx = (train_x - mu) / sd
    ex = (eval_x - mu) / sd
    d = tx.shape[-1]
    w0 = jnp.zeros((d, num_classes), jnp.float32)
    b0 = jnp.zeros((num_classes,), jnp.float32)
    tx_opt = optax.adam(lr)

    def loss_fn(wb):
        w, b = wb
        logits = tx @ w + b
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, train_y.reshape(-1)
        ).mean()
        return ce + l2 * jnp.sum(w * w)

    def step(carry, _):
        wb, opt_state = carry
        grads = jax.grad(loss_fn)(wb)
        updates, opt_state = tx_opt.update(grads, opt_state, wb)
        return (optax.apply_updates(wb, updates), opt_state), None

    (wb, _), _ = jax.lax.scan(
        step, ((w0, b0), tx_opt.init((w0, b0))), None, length=steps
    )
    w, b = wb
    return jnp.argmax(ex @ w + b, axis=-1).astype(jnp.int32)
