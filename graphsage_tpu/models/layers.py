"""One GraphSAGE layer: aggregate sampled neighbors, project, activate.

Functionally equivalent to the reference Encoder + MeanAggregator pair
(reference graphsage/encoders.py:33-50, aggregators.py:30-65) but expressed as
a pure function over a params pytree and static-shape tensors, so XLA fuses
the aggregate->concat->matmul->ReLU chain into a couple of MXU/VPU ops.

Three aggregators — the GraphSAGE paper's full family (§3.3; the reference
ships only the mean, aggregators.py:30-65):

* ``mean``     — masked neighbor mean (reference MeanAggregator).
* ``maxpool``  — per-neighbor MLP then masked max (GraphSAGE-pool; exercises
  the SDDMM-style per-edge compute from BASELINE.json config #3).
* ``lstm``     — an LSTM scanned over the sampled neighbor sequence, the
  aggregate is the final hidden state. TPU-shape: ``lax.scan`` over the
  (static, small) fanout axis, each step two batched ``[B, ·]·[·, 4H]``
  matmuls on the MXU — no dynamic shapes, no per-node loops. Invalid slots
  carry the state through unchanged, so padding anywhere in the row and
  empty rows (aggregate 0, quirk Q4) are exact. The paper's random
  neighbor *permutation* is supplied by the sampler: below-degree fanouts
  draw a fresh random subset each step (ops/sampling.py Floyd), and at
  covering fanouts the order is the adjacency (ELL) order — deterministic,
  which is what makes sampled == full-graph parity exact there.

Two combine modes:

* ``concat_self=False`` — the reference's *shipped* mode (quirk Q2,
  ``Encoder(gcn=True)``): ``h = act(W @ mean(neigh))`` with **no** self term.
* ``concat_self=True``  — true GraphSAGE: ``h = act(W @ [self ; agg(neigh)])``.

Weights are stored ``[in, out]`` (JAX row-vector convention). The reference
stores ``[out, in]`` and left-multiplies (encoders.py:49); the parity harness
transposes on import.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from graphsage_tpu.ops.aggregate import masked_max, masked_mean


@struct.dataclass
class SAGELayerParams:
    weight: jax.Array  # [combined_in, out]
    pool_weight: Optional[jax.Array] = None  # [in, pool_dim] (maxpool only)
    pool_bias: Optional[jax.Array] = None  # [pool_dim]
    lstm_wx: Optional[jax.Array] = None  # [in, 4*lstm_dim] (lstm only)
    lstm_wh: Optional[jax.Array] = None  # [lstm_dim, 4*lstm_dim]
    lstm_b: Optional[jax.Array] = None  # [4*lstm_dim] (forget bias init +1)


def combined_input_dim(in_dim: int, pool_dim: int | None, aggregator: str, concat_self: bool) -> int:
    # pool_dim doubles as the aggregator hidden width for maxpool AND lstm.
    agg_dim = in_dim if aggregator == "mean" else (pool_dim or in_dim)
    return agg_dim + (in_dim if concat_self else 0)


def split_mean_weight(
    weight: jax.Array, in_dim: int, concat_self: bool
) -> tuple[jax.Array | None, jax.Array]:
    """Split a mean-aggregator layer weight into (self, neighbor) halves.

    With ``concat_self`` the weight is ``[2*in, out]`` applied to
    ``[self ‖ mean(neigh)]``; since the mean is linear,
    ``concat @ W == self @ W[:in] + mean(neigh) @ W[in:]`` — the identity
    behind the project-then-aggregate reordering (aggregate narrow instead of
    wide). Returns ``(None, W)`` when there is no self term (quirk Q2 mode).
    """
    if not concat_self:
        return None, weight
    return weight[:in_dim], weight[in_dim:]


def init_sage_layer(
    key: jax.Array,
    in_dim: int,
    out_dim: int,
    aggregator: str = "mean",
    concat_self: bool = False,
    pool_dim: int | None = None,
    param_dtype: jnp.dtype = jnp.float32,
) -> SAGELayerParams:
    """Xavier/glorot-uniform init, matching the reference's
    ``init.xavier_uniform_`` (encoders.py:31). For ``lstm`` the input and
    recurrent kernels are glorot too, with the standard +1 forget-gate bias
    (gate order i, f, g, o)."""
    if aggregator not in ("mean", "maxpool", "lstm"):
        raise ValueError(f"unknown aggregator {aggregator!r}")
    k_w, k_p = jax.random.split(key)
    cin = combined_input_dim(in_dim, pool_dim, aggregator, concat_self)
    glorot = jax.nn.initializers.glorot_uniform()
    weight = glorot(k_w, (cin, out_dim), param_dtype)
    pool_weight = pool_bias = None
    lstm_wx = lstm_wh = lstm_b = None
    if aggregator == "maxpool":
        pdim = pool_dim or in_dim
        pool_weight = glorot(k_p, (in_dim, pdim), param_dtype)
        pool_bias = jnp.zeros((pdim,), param_dtype)
    elif aggregator == "lstm":
        hdim = pool_dim or in_dim
        k_x, k_h = jax.random.split(k_p)
        lstm_wx = glorot(k_x, (in_dim, 4 * hdim), param_dtype)
        lstm_wh = glorot(k_h, (hdim, 4 * hdim), param_dtype)
        lstm_b = jnp.zeros((4 * hdim,), param_dtype).at[hdim : 2 * hdim].set(1.0)
    return SAGELayerParams(
        weight=weight, pool_weight=pool_weight, pool_bias=pool_bias,
        lstm_wx=lstm_wx, lstm_wh=lstm_wh, lstm_b=lstm_b,
    )


def masked_lstm(
    wx: jax.Array,  # [d_in, 4H]
    wh: jax.Array,  # [H, 4H]
    b: jax.Array,  # [4H]
    neigh_feats: jax.Array,  # [..., k, d_in]
    neigh_mask: jax.Array,  # [..., k]
    *,
    precision=None,
) -> jax.Array:
    """Final hidden state of an LSTM over each row's neighbor sequence.

    ``lax.scan`` over the k (fanout) axis — k is static and small, so the
    unrolled compute is k pairs of batched matmuls on the MXU; there is no
    per-node control flow. Slots with ``mask == False`` carry ``(h, c)``
    through unchanged, which makes the result independent of WHERE padding
    sits in the row and returns exactly 0 for empty rows (quirk Q4's guard,
    same convention as the masked mean/max). Gate math runs in f32
    regardless of the input dtype — sigmoid/tanh recurrences saturate in
    bf16 — and the result is cast back to the input dtype.
    """
    h_dim = wh.shape[0]
    lead = neigh_feats.shape[:-2]
    k = neigh_feats.shape[-2]
    x = neigh_feats.reshape(-1, k, neigh_feats.shape[-1])
    m = neigh_mask.reshape(-1, k)
    bsz = x.shape[0]
    # Hoist the input projection out of the scan: one [B*k, d_in] @ [d_in, 4H]
    # MXU pass instead of k small ones (the recurrent matmul is the only
    # genuinely sequential work).
    xg = jnp.einsum(
        "bki,io->bko", x, wx.astype(x.dtype),
        preferred_element_type=jnp.float32, precision=precision,
    )  # [B, k, 4H] f32
    wh32 = wh.astype(jnp.float32)
    b32 = b.astype(jnp.float32)

    def step(carry, inp):
        h, c = carry
        gates_x, valid = inp
        gates = (
            gates_x
            + jnp.einsum(
                "bh,ho->bo", h, wh32,
                preferred_element_type=jnp.float32, precision=precision,
            )
            + b32
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        keep = valid[:, None]
        return (jnp.where(keep, h_new, h), jnp.where(keep, c_new, c)), None

    init = (
        jnp.zeros((bsz, h_dim), jnp.float32),
        jnp.zeros((bsz, h_dim), jnp.float32),
    )
    (h_final, _), _ = jax.lax.scan(
        step, init, (jnp.swapaxes(xg, 0, 1), jnp.swapaxes(m, 0, 1))
    )
    return h_final.reshape(*lead, h_dim).astype(neigh_feats.dtype)


def apply_full_graph_mean_layer(
    p: SAGELayerParams,
    h: jax.Array,  # [..., N_local, d_in]
    spmm,  # Callable[[x], (neigh_mean [..., N_local, d], valid_count [..., N_local])]
    *,
    concat_self: bool,
    self_loop: bool,
    project_first: bool,
    precision=None,
    activation=jax.nn.relu,  # None = linear output (unsupervised last layer)
) -> jax.Array:
    """One full-graph mean layer, shared by the single-device, the
    edge-partitioned, and the halo-exchange paths (they differ only in the
    ``spmm`` closure). Keeping this logic in ONE place is what guarantees the
    distributed paths stay allclose to :meth:`GraphSAGE.forward_full_graph`
    across every mode (concat_self / self_loop / project_first)."""
    if activation is None:
        activation = lambda x: x  # noqa: E731
    d_in = h.shape[-1]
    w = p.weight.astype(h.dtype)
    if project_first:
        w_self, w_neigh = split_mean_weight(w, d_in, concat_self)
        hp = jnp.einsum(
            "...i,io->...o", h, w_neigh,
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(h.dtype)
        mean, cnt = spmm(hp)
        pre = mean.astype(jnp.float32)
        if self_loop:
            c = cnt.astype(jnp.float32)[..., None]
            pre = (pre * c + hp.astype(jnp.float32)) / (c + 1.0)
        if concat_self:
            pre = pre + jnp.einsum(
                "...i,io->...o", h, w_self,
                preferred_element_type=jnp.float32, precision=precision,
            )
        return activation(pre).astype(h.dtype)
    mean, cnt = spmm(h)
    if self_loop:
        c = cnt.astype(mean.dtype)[..., None]
        mean = (mean * c + h.astype(mean.dtype)) / (c + 1.0)
    combined = jnp.concatenate([h, mean], axis=-1) if concat_self else mean
    return activation(
        jnp.einsum(
            "...i,io->...o", combined, w,
            preferred_element_type=jnp.float32, precision=precision,
        )
    ).astype(h.dtype)


def apply_full_graph_maxpool_layer(
    p: SAGELayerParams,
    h: jax.Array,  # [..., N_local, d_in]
    segmax,  # Callable[[pooled], (agg [..., N_local, pd], valid [..., N_local] | None)]
    *,
    concat_self: bool,
    self_loop: bool,
    precision=None,
    activation=jax.nn.relu,  # output only; the pooling MLP ReLU is intrinsic
) -> jax.Array:
    """One full-graph max-pooling layer, shared by the single-device, the
    edge-partitioned, and the halo-exchange paths (they differ only in the
    ``segmax`` closure — the same single-definition guarantee as
    :func:`apply_full_graph_mean_layer`). ``segmax`` receives the pooled
    per-node values and must return the guarded per-destination max (0 on
    empty rows, quirk Q4) plus an optional valid count."""
    if activation is None:
        activation = lambda x: x  # noqa: E731
    pooled = jax.nn.relu(
        jnp.einsum(
            "...ni,io->...no", h, p.pool_weight.astype(h.dtype),
            preferred_element_type=jnp.float32, precision=precision,
        )
        + p.pool_bias.astype(h.dtype)
    ).astype(h.dtype)
    agg, _ = segmax(pooled)
    agg = agg.astype(h.dtype)
    if self_loop:
        # pooled >= 0 (ReLU) and empty rows aggregate to 0, so a plain
        # elementwise max adds the self loop exactly.
        agg = jnp.maximum(agg, pooled)
    combined = jnp.concatenate([h, agg], axis=-1) if concat_self else agg
    return activation(
        jnp.einsum(
            "...ni,io->...no", combined, p.weight.astype(h.dtype),
            preferred_element_type=jnp.float32, precision=precision,
        )
    ).astype(h.dtype)


def apply_sage_layer(
    params: SAGELayerParams,
    self_feats: jax.Array | None,  # [..., in_dim] or None when concat_self=False
    neigh_feats: jax.Array,  # [..., k, in_dim]
    neigh_mask: jax.Array,  # [..., k]
    aggregator: str = "mean",
    concat_self: bool = False,
    activation: Callable[[jax.Array], jax.Array] | None = jax.nn.relu,
    compute_dtype: jnp.dtype | None = None,
    precision: jax.lax.Precision | str | None = None,
    precomputed_agg: jax.Array | None = None,
) -> jax.Array:
    """Apply one layer. Returns ``[..., out_dim]``.

    ``compute_dtype=jnp.bfloat16`` runs the matmuls on the MXU in bf16 with
    fp32 accumulation; params and the returned activations stay in the params
    dtype for stable training. ``precision="highest"`` forces full-f32 MXU
    passes (TPU matmuls default to bf16 inputs) — used by parity tests.
    """
    w = params.weight
    out_dtype = w.dtype
    if compute_dtype is not None:
        if neigh_feats is not None:
            neigh_feats = neigh_feats.astype(compute_dtype)
        if self_feats is not None:
            self_feats = self_feats.astype(compute_dtype)
        w = w.astype(compute_dtype)

    if precomputed_agg is not None:
        # Neighbor aggregation already fused upstream (Pallas gather-mean on
        # the deepest hop); only combine + project here.
        agg = precomputed_agg.astype(
            compute_dtype if compute_dtype is not None else out_dtype
        )
    elif aggregator == "mean":
        agg = masked_mean(neigh_feats, neigh_mask)
    elif aggregator == "lstm":
        agg = masked_lstm(
            params.lstm_wx, params.lstm_wh, params.lstm_b,
            neigh_feats, neigh_mask, precision=precision,
        )
    else:  # maxpool: per-neighbor MLP, then masked max
        pw = params.pool_weight
        pb = params.pool_bias
        if compute_dtype is not None:
            pw = pw.astype(compute_dtype)
            pb = pb.astype(compute_dtype)
        hidden = jax.nn.relu(
            jnp.einsum(
                "...ki,io->...ko", neigh_feats, pw,
                preferred_element_type=jnp.float32, precision=precision,
            )
            + pb
        ).astype(neigh_feats.dtype)
        agg = masked_max(hidden, neigh_mask)

    if concat_self:
        if self_feats is None:
            raise ValueError("concat_self=True requires self_feats")
        combined = jnp.concatenate([self_feats, agg], axis=-1)
    else:
        combined = agg

    out = jnp.einsum(
        "...i,io->...o", combined, w,
        preferred_element_type=jnp.float32, precision=precision,
    )
    out = out.astype(out_dtype)
    if activation is not None:
        out = activation(out)
    return out
