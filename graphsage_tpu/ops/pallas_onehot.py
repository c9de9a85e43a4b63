"""Pallas TPU kernel: neighbor mean as a blocked one-hot matmul on the MXU.

``onehot_gather_mean(features[N, F], idx[B, k], mask[B, k]) -> [B, F]``

Measured on TPU v5e (Cora shapes, N=2708 F=1433 B=2560 k=10, scan-amortized):
XLA's dynamic gather runs at ~106 GB/s useful bandwidth and a dense XLA
one-hot matmul at ~47 TFLOP/s — the MXU formulation is 3.6x faster because
random-row gathers underutilize the memory system while the systolic array is
effectively free at these sizes. This kernel goes further than the XLA
one-hot: the ``[B, N]`` selection matrix is never materialized in HBM — each
``[TB, NB]`` tile is generated on the VPU (k compares against a column iota)
directly in VMEM and fed to the MXU, so HBM traffic is just the feature
blocks plus the output.

Scaling: compute is O(B·N·F), so this is the right kernel when the node
table is modest (minibatch frontiers over graphs up to ~100K nodes — Cora,
Pubmed, Reddit-scale). For much larger N the dispatcher in
:mod:`graphsage_tpu.ops.aggregate` falls back to the XLA gather.

Backward: with the project-then-aggregate reordering the feature argument is
a *projected* table (X @ W), so the cotangent flows through every step — and
XLA's scatter-add (segment_sum) runs at ~0.7 ms for the Cora step's 28K-edge
slots. ``_scatter_kernel`` instead computes ``dfeat = Mᵀ @ (g / cnt)`` with
the same on-the-fly one-hot tiles transposed (idx/mask are fed transposed
``[k, B]`` so the compare broadcasts along lanes), putting the scatter on the
MXU as well (~0.1 ms at the same shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(idx_ref, mask_ref, feat_ref, out_ref, acc_ref, *, nb, k, n_blocks, bf16):
    """Grid (b_block, n_block), n innermost. Accumulates ``onehot @ feats``
    into an f32 VMEM scratch, normalizes by the valid count on the last
    n-step."""
    n = pl.program_id(1)

    @pl.when(n == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tb = idx_ref.shape[0]
    off = n * nb
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, nb), 1) + off
    dot_dtype = jnp.bfloat16 if bf16 else jnp.float32
    onehot = jnp.zeros((tb, nb), dot_dtype)
    for j in range(k):  # k is small and static: unrolled VPU compares
        hit = (idx_ref[:, j : j + 1] == col) & (mask_ref[:, j : j + 1] != 0)
        onehot += hit.astype(dot_dtype)

    acc_ref[:] += jnp.dot(
        onehot, feat_ref[:].astype(dot_dtype), preferred_element_type=jnp.float32
    )

    @pl.when(n == n_blocks - 1)
    def _():
        cnt = jnp.sum((mask_ref[:] != 0).astype(jnp.float32), axis=1, keepdims=True)
        out_ref[:] = acc_ref[:] / jnp.maximum(cnt, 1.0)


def _onehot_gather_mean_impl(
    features: jax.Array,
    idx: jax.Array,
    mask: jax.Array,
    *,
    block_b: int = 512,
    block_n: int = 512,
    bf16: bool = False,
    interpret: bool = False,
) -> jax.Array:
    b, k = idx.shape
    n, f = features.shape
    f_pad = _round_up(f, LANE)
    n_pad = _round_up(n, block_n)
    b_pad = _round_up(b, block_b)

    dot_dtype = jnp.bfloat16 if bf16 else jnp.float32
    feats = features.astype(dot_dtype)
    if (n_pad, f_pad) != (n, f):
        feats = jnp.pad(feats, ((0, n_pad - n), (0, f_pad - f)))
    if b_pad != b:
        idx = jnp.pad(idx, ((0, b_pad - b), (0, 0)))
        mask = jnp.pad(mask, ((0, b_pad - b), (0, 0)))

    n_blocks = n_pad // block_n
    grid = (b_pad // block_b, n_blocks)
    out = pl.pallas_call(
        functools.partial(
            _kernel, nb=block_n, k=k, n_blocks=n_blocks, bf16=bf16
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, k), lambda bb, nn: (bb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, k), lambda bb, nn: (bb, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, f_pad), lambda bb, nn: (nn, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b, f_pad), lambda bb, nn: (bb, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, f_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_b, f_pad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * f_pad,
            bytes_accessed=(
                grid[0] * n_pad * f_pad * feats.dtype.itemsize + b_pad * f_pad * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx.astype(jnp.int32), mask.astype(jnp.int32), feats)
    return out[:b, :f]


def _scatter_kernel(idxT_ref, maskT_ref, g_ref, out_ref, acc_ref, *, nb, k, b_blocks, bf16):
    """Grid (n_block, b_block), b innermost: ``acc += onehotᵀ @ g`` where the
    transposed one-hot tile ``[NB, TB]`` is built by broadcasting each of the
    k prefetched ``[1, TB]`` index rows against a row iota."""
    bb = pl.program_id(1)

    @pl.when(bb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tb = idxT_ref.shape[1]
    off = pl.program_id(0) * nb
    row = jax.lax.broadcasted_iota(jnp.int32, (nb, tb), 0) + off
    dot_dtype = jnp.bfloat16 if bf16 else jnp.float32
    onehot = jnp.zeros((nb, tb), dot_dtype)
    for j in range(k):  # k is small and static: unrolled VPU compares
        hit = (idxT_ref[j : j + 1, :] == row) & (maskT_ref[j : j + 1, :] != 0)
        onehot += hit.astype(dot_dtype)

    acc_ref[:] += jnp.dot(
        onehot, g_ref[:].astype(dot_dtype), preferred_element_type=jnp.float32
    )

    @pl.when(bb == b_blocks - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _onehot_scatter_mean_grad(
    g: jax.Array,  # [B, F] cotangent of the masked mean
    idx: jax.Array,  # [B, k]
    mask: jax.Array,  # [B, k]
    num_rows: int,
    *,
    block_b: int = 512,
    block_n: int = 512,
    bf16: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """``dfeat[N, F] = Mᵀ @ (g / valid_count)`` on the MXU (M = the forward's
    row-normalized one-hot mean matrix)."""
    b, k = idx.shape
    f = g.shape[-1]
    f_pad = _round_up(f, LANE)
    n_pad = _round_up(num_rows, block_n)
    b_pad = _round_up(b, block_b)

    w = mask.astype(jnp.float32)
    cnt = jnp.maximum(w.sum(axis=1, keepdims=True), 1.0)
    gs = (g.astype(jnp.float32) / cnt).astype(jnp.bfloat16 if bf16 else jnp.float32)
    if (b_pad, f_pad) != (b, f):
        gs = jnp.pad(gs, ((0, b_pad - b), (0, f_pad - f)))
        idx = jnp.pad(idx, ((0, b_pad - b), (0, 0)))
        mask = jnp.pad(mask, ((0, b_pad - b), (0, 0)))

    b_blocks = b_pad // block_b
    grid = (n_pad // block_n, b_blocks)
    out = pl.pallas_call(
        functools.partial(
            _scatter_kernel, nb=block_n, k=k, b_blocks=b_blocks, bf16=bf16
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, block_b), lambda nn, bb: (0, bb), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, block_b), lambda nn, bb: (0, bb), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, f_pad), lambda nn, bb: (bb, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_n, f_pad), lambda nn, bb: (nn, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, f_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((block_n, f_pad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * f_pad,
            bytes_accessed=(
                grid[0] * b_pad * f_pad * gs.dtype.itemsize + n_pad * f_pad * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        idx.astype(jnp.int32).T,
        mask.astype(jnp.int32).T,
        gs,
    )
    return out[:num_rows, :f]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def onehot_gather_mean(
    features: jax.Array,
    idx: jax.Array,
    mask: jax.Array,
    block_b: int = 512,
    block_n: int = 512,
    bf16: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Fused ``masked_mean(features[idx], mask)`` via MXU one-hot matmul."""
    return _onehot_gather_mean_impl(
        features, idx, mask,
        block_b=block_b, block_n=block_n, bf16=bf16, interpret=interpret,
    )


def _fwd(features, idx, mask, block_b, block_n, bf16, interpret):
    out = _onehot_gather_mean_impl(
        features, idx, mask,
        block_b=block_b, block_n=block_n, bf16=bf16, interpret=interpret,
    )
    sentinel = jnp.zeros((features.shape[0], 0), features.dtype)
    return out, (sentinel, idx, mask)


def _bwd(block_b, block_n, bf16, interpret, res, g):
    sentinel, idx, mask = res
    n, dtype = sentinel.shape[0], sentinel.dtype
    dfeat = _onehot_scatter_mean_grad(
        g, idx, mask, n,
        block_b=block_b, block_n=block_n, bf16=bf16, interpret=interpret,
    )
    return dfeat.astype(dtype), None, None


onehot_gather_mean.defvjp(_fwd, _bwd)
