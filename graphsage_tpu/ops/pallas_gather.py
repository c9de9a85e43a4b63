"""Pallas TPU kernel: fused gather + masked mean over sampled neighbors.

``gather_mean(features[N, F], idx[B, k], mask[B, k]) -> [B, F]``

This is the framework's hottest memory op: the deepest-hop feature gather
feeding layer 0 (the role ATen's embedding-gather + dense-mask GEMM plays in
the reference, aggregators.py:61-64). The XLA formulation materializes the
gathered ``[B, k, F]`` tensor in HBM and re-reads it for the reduction —
3x the compulsory traffic. This kernel streams each neighbor row HBM->VMEM
once with double-buffered DMA and accumulates the masked mean in VMEM,
touching ``B*k*F`` reads + ``B*F`` writes (the roofline minimum).

Backward is a scatter-add of ``g[b] / count[b]`` into neighbor rows —
expressed with XLA's segment_sum (already bandwidth-bound and efficient) via
``jax.custom_vjp``.

Layout requirements handled by the wrapper: ``F`` padded to the 128-lane
boundary, ``B`` padded to the row-block size. Set ``interpret=True`` to run
on CPU (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
DEFAULT_ROW_BLOCK = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gather_mean_kernel(idx_ref, mask_ref, feat_ref, out_ref, scratch, sems, *, tb, k):
    """One grid step computes ``tb`` output rows, streaming ``tb*k`` feature
    rows through a 2-slot VMEM scratch with overlapped DMA."""
    blk = pl.program_id(0)
    total = tb * k

    out_ref[:] = jnp.zeros_like(out_ref)

    # Mosaic (v5e) requires DMA slices tile-aligned in dim 0 (8 rows for f32,
    # aligned start). Each gather copies the aligned 8-row window containing
    # the neighbor row, then selects the row on the VPU.
    # idx/mask are prefetched flat [(B*k,)] — SMEM pads the trailing dim of 2D
    # arrays to 128 entries, which would blow the 1 MB SMEM budget.
    base_edge = blk * tb * k

    def dma(slot, i):
        g = idx_ref[base_edge + i]
        base = pl.multiple_of((g // 8) * 8, 8)
        return pltpu.make_async_copy(
            feat_ref.at[pl.ds(base, 8)], scratch.at[slot], sems.at[slot]
        )

    dma(0, 0).start()

    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def body(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < total)
        def _():
            dma(jax.lax.rem(i + 1, 2), i + 1).start()

        dma(slot, i).wait()
        r = i // k
        g = idx_ref[base_edge + i]
        m = mask_ref[base_edge + i].astype(jnp.float32)
        row = jnp.sum(
            jnp.where(sub_iota == g % 8, scratch[slot], 0.0), axis=0, keepdims=True
        )
        out_ref[pl.ds(r, 1), :] += row * m
        return 0

    jax.lax.fori_loop(0, total, body, 0, unroll=False)

    def div_body(r, _):
        cnt = jax.lax.fori_loop(
            0, k, lambda j, c: c + mask_ref[base_edge + r * k + j], jnp.int32(0)
        )
        inv = 1.0 / jnp.maximum(cnt.astype(jnp.float32), 1.0)
        out_ref[pl.ds(r, 1), :] *= inv
        return 0

    jax.lax.fori_loop(0, tb, div_body, 0, unroll=False)


def _gather_mean_impl(
    features: jax.Array,
    idx: jax.Array,
    mask: jax.Array,
    *,
    row_block: int = DEFAULT_ROW_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    b, k = idx.shape
    n, f = features.shape
    f_pad = _round_up(f, LANE)
    b_pad = _round_up(b, row_block)

    feats = features.astype(jnp.float32)
    # +8 tail rows so the 8-row DMA window never runs past the array.
    feats = jnp.pad(feats, ((0, 8), (0, f_pad - f)))
    if b_pad != b:
        idx = jnp.pad(idx, ((0, b_pad - b), (0, 0)))
        mask = jnp.pad(mask, ((0, b_pad - b), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b_pad // row_block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (row_block, f_pad),
            lambda blk, idx_ref, mask_ref: (blk, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 8, f_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_gather_mean_kernel, tb=row_block, k=k),
        out_shape=jax.ShapeDtypeStruct((b_pad, f_pad), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx.astype(jnp.int32).reshape(-1), mask.astype(jnp.int32).reshape(-1), feats)
    return out[:b, :f]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def gather_mean(
    features: jax.Array,
    idx: jax.Array,
    mask: jax.Array,
    row_block: int = DEFAULT_ROW_BLOCK,
    interpret: bool = False,
) -> jax.Array:
    """Fused ``masked_mean(features[idx], mask)`` -> ``[B, F]`` (f32)."""
    return _gather_mean_impl(
        features, idx, mask, row_block=row_block, interpret=interpret
    )


def _fwd(features, idx, mask, row_block, interpret):
    out = _gather_mean_impl(
        features, idx, mask, row_block=row_block, interpret=interpret
    )
    # Zero-size sentinel carries N and the param dtype statically.
    sentinel = jnp.zeros((features.shape[0], 0), features.dtype)
    return out, (sentinel, idx, mask)


def _bwd(row_block, interpret, res, g):
    sentinel, idx, mask = res
    n, dtype = sentinel.shape[0], sentinel.dtype
    f = g.shape[-1]
    b, k = idx.shape
    w = mask.astype(g.dtype)
    cnt = jnp.maximum(w.sum(axis=1, keepdims=True), 1.0)
    per_edge = (g / cnt)[:, None, :] * w[:, :, None]  # [B, k, F]
    dfeat = jax.ops.segment_sum(
        per_edge.reshape(b * k, f), idx.reshape(b * k), num_segments=n
    )
    return dfeat.astype(dtype), None, None


gather_mean.defvjp(_fwd, _bwd)


def gather_mean_reference(features, idx, mask):
    """XLA formulation (take + masked mean) — the correctness oracle and the
    fallback path the model uses when the Pallas kernel is disabled."""
    from graphsage_tpu.ops.aggregate import masked_mean

    return masked_mean(jnp.take(features, idx, axis=0), mask)
