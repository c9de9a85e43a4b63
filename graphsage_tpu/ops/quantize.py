"""Int8 per-row quantized feature tables.

The feature table is the framework's largest resident buffer (the role of the
reference's frozen ``nn.Embedding`` weight, reference graphsage/model.py:70-71
— ``requires_grad=False``, never updated), and the deepest-hop gather from it
is the measured bottleneck of every large config (docs/ROOFLINE.md). Because
the table is *frozen*, it can be quantized once at build time with zero
training-loop cost:

* **HBM capacity**: ``N·F`` int8 bytes + ``4·N`` scale bytes — 2x smaller than
  bf16, 4x smaller than f32 (1M x 256 table: 512 MB f32 -> 260 MB).
* **Gather traffic**: the deepest-hop gather moves int8 rows; the dequant
  multiply fuses into the consumer (VPU, free). No int8 variant of the
  one-hot MXU kernel is needed: small-table configs keep project-first
  (their gather-mean then runs on the dense f32 *projected* table, where
  the Pallas one-hot dispatch still applies), and large tables dispatch to
  the XLA gather anyway.
* **Exact project-first**: per-row scales commute with the row-wise
  projection — ``(diag(s)·Q) @ W == diag(s)·(Q @ W)`` — and int8 values are
  exactly representable in bf16, so the project-then-aggregate layer-0 path
  matmuls the RAW int8 values (lossless bf16 cast, f32 accumulation) and
  applies the scale once, in f32, after — strictly fewer roundings than
  dequantize-then-cast-then-project.

Quantization is symmetric per-row: ``scale[n] = max|x[n,:]| / 127``,
``q = round(x / scale)``. Rows of all zeros get scale 1. The quantization
*error* is bounded by ``scale/2`` per element; parity tests pin the exactness
of the pipeline on pre-quantized inputs instead, where the only difference is
representation, not value.

Scope: every trainer accepts a :class:`QuantizedTable` anywhere it accepts a
dense ``features`` array — the single-table trainers gather int8 rows
locally, and the node-sharded feature store shards ``q`` + scales on the same
node ranges and moves int8 rows (+4-byte scales) through its cross-shard
exchanges: ``F + 4`` bytes per answered row instead of ``4F`` on the wire
(parallel/feature_store.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class QuantizedTable(NamedTuple):
    """Per-row symmetric int8 table: ``dequant = q * scale`` (row-broadcast).

    A plain NamedTuple so it is a pytree (jit/device_put/tree_map all work);
    ``shape``/``dtype`` mirror a dense array's so shape- and itemsize-driven
    dispatch (e.g. the backward-aware layer-0 ordering) sees the quantized
    byte width without special cases.
    """

    q: jax.Array  # int8 [N, F]
    scale: jax.Array  # f32 [N, 1]

    @property
    def shape(self) -> tuple[int, ...]:
        return self.q.shape

    @property
    def dtype(self):
        return self.q.dtype

    @property
    def nbytes(self) -> int:
        return int(self.q.size) * self.q.dtype.itemsize + int(self.scale.size) * 4


def is_quantized(table) -> bool:
    return isinstance(table, QuantizedTable)


def quantize_features(x) -> QuantizedTable:
    """Quantize a dense ``[N, F]`` table to int8 with per-row symmetric scales.

    numpy in -> numpy leaves out (host graphs stay host, quantization runs
    once on the host and only the small table is ever transferred);
    jax array in -> jax leaves out.
    """
    if isinstance(x, np.ndarray):
        xf = x.astype(np.float32, copy=False)
        maxabs = np.max(np.abs(xf), axis=1, keepdims=True)
        scale = np.where(maxabs > 0, maxabs / 127.0, 1.0).astype(np.float32)
        q = np.clip(np.rint(xf / scale), -127, 127).astype(np.int8)
        return QuantizedTable(q=q, scale=scale)
    xf = jnp.asarray(x, jnp.float32)
    maxabs = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    scale = jnp.where(maxabs > 0, maxabs / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.rint(xf / scale), -127, 127).astype(jnp.int8)
    return QuantizedTable(q=q, scale=scale)


def quantize_rows(x: jax.Array) -> QuantizedTable:
    """Trace-friendly row quantization over the LAST axis of any rank
    (``[..., F]`` -> q ``[..., F]`` int8 + scale ``[..., 1]`` f32) — the
    in-jit variant used e.g. by the serving table tier to quantize the
    refreshed embedding table without leaving the device."""
    xf = x.astype(jnp.float32)
    maxabs = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(maxabs > 0, maxabs / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.rint(xf / scale), -127, 127).astype(jnp.int8)
    return QuantizedTable(q=q, scale=scale)


def dequantize(qt: QuantizedTable, dtype=jnp.float32) -> jax.Array:
    """Full dense table ``q * scale`` (materializes ``[N, F]`` — the fallback
    for paths that want a dense array, e.g. the full-graph layers)."""
    if isinstance(qt.q, np.ndarray):
        return (qt.q.astype(np.float32) * qt.scale).astype(dtype)
    return (qt.q.astype(jnp.float32) * qt.scale).astype(dtype)


# XLA's TPU row gather has a measured table-size cliff (~3.8 ns/row when
# the operand is <=150-200K rows AND <=100 MB, ~10.4 ns/row beyond — the
# round-4 sweep, docs/ROOFLINE.md §5.1a). An [N, 1] scale column is tiny in
# bytes but its ROW count alone puts it in the slow region at large N, so
# the scale lookup was costing as much as the int8 row gather itself
# (the 1M-preset int8 step measured 1.39x SLOWER than bf16). Above this
# threshold the scale gathers through a [N/128, 128] lane view instead:
# N/128 rows and 4N bytes are both deep inside the fast region, and the
# lane select is a fused compare-select-reduce (the same trick the CSR
# sampler uses for edge-id resolution, ops/sampling.py).
_SCALE_LANE_GATHER_MIN_ROWS = 200_000


def _gather_scale(scale: jax.Array, ids: jax.Array) -> jax.Array:
    """Per-row scales for ``ids[...]`` -> ``[..., 1]`` f32."""
    n = scale.shape[0]
    if n < _SCALE_LANE_GATHER_MIN_ROWS:
        return jnp.take(scale, ids, axis=0)
    flat = ids.reshape(-1).astype(jnp.int32)
    lanes = jnp.pad(scale.reshape(-1), (0, (-n) % 128)).reshape(-1, 128)
    rows = jnp.take(lanes, flat // 128, axis=0)  # [Q, 128] — fast region
    col = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    s = jnp.sum(jnp.where(col == (flat % 128)[:, None], rows, 0.0), axis=-1)
    return s.reshape(*ids.shape, 1)


def gather_dequant(qt: QuantizedTable, ids: jax.Array, dtype=jnp.float32) -> jax.Array:
    """Row lookup ``dequantize(qt)[ids]`` moving int8 rows through HBM.

    The gather reads 1 byte/element (+4 bytes/row of scale, through the
    lane view at large N); the cast and multiply fuse into the consumer.
    """
    rows = jnp.take(qt.q, ids, axis=0).astype(jnp.float32)
    s = _gather_scale(qt.scale, ids)
    return (rows * s).astype(dtype)


def gather_mean_dequant(
    qt: QuantizedTable, idx: jax.Array, mask: jax.Array
) -> jax.Array:
    """Masked mean of dequantized neighbor rows: ``[B, k]`` ids/mask ->
    ``[B, F]`` f32. The quantized stand-in for
    :func:`graphsage_tpu.ops.aggregate.gather_mean` — the gather moves int8,
    the mean accumulates in f32 on the VPU. Small fanouts unroll over k so
    the ``[B, k, F]`` transient never lands in HBM; wide k (the
    fanout=None / covering-eval paths, where k is the ELL width) keeps the
    single batched gather — hundreds of sequential unrolled gathers would
    bloat the HLO and serialize (same k <= 32 gate as
    aggregate.gather_mean's "auto" dispatch)."""
    k = idx.shape[-1]
    s = _gather_scale(qt.scale, idx)  # [..., k, 1]
    m = mask.astype(jnp.float32)[..., None]
    w = s * m
    count = jnp.sum(m, axis=-2)
    if k > 32:
        rows = jnp.take(qt.q, idx, axis=0).astype(jnp.float32)  # [B, k, F]
        return jnp.sum(rows * w, axis=-2) / jnp.maximum(count, 1.0)
    total = None
    for j in range(k):
        rows_j = jnp.take(qt.q, idx[..., j], axis=0).astype(jnp.float32)
        term = rows_j * w[..., j, :]
        total = term if total is None else total + term
    return total / jnp.maximum(count, 1.0)


def dense_host_view(features) -> np.ndarray:
    """Host numpy dense view of a feature table (dequantizing if needed) —
    for host-side preprocessing that wants raw rows (halo h0 stacking,
    partition builds). Runs once on the host; never touches the device."""
    if isinstance(features, QuantizedTable):
        return np.asarray(features.q, np.float32) * np.asarray(features.scale)
    return np.asarray(features)


def project_table(
    qt: QuantizedTable,
    w: jax.Array,
    *,
    precision=None,
) -> jax.Array:
    """``dequantize(qt) @ w`` without materializing the dense table.

    Exact in structure: per-row scales commute with the projection
    (``(s_n · q_nf) W_fo == s_n · (q W)_no``), and int8 values cast to bf16
    losslessly (|q| <= 127 < 2^8) — so the contraction runs on raw int8
    values with f32 accumulation and the scale is applied ONCE, in f32,
    afterwards (one rounding per output element, vs per-term rounding of
    ``q·s`` in the dequantize-first formulation). Returns f32 ``[N, d_out]``.
    """
    proj = jnp.einsum(
        "nf,fo->no",
        qt.q.astype(w.dtype),
        w,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return (proj * qt.scale).astype(jnp.float32)
