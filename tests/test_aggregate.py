"""Aggregation primitives vs straightforward numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from graphsage_tpu.ops.aggregate import (
    gather,
    masked_max,
    masked_mean,
    segment_mean_csr,
    spmm_mean,
)


def test_masked_mean_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 7, 3)).astype(np.float32)
    mask = rng.random((5, 7)) < 0.6
    got = np.asarray(masked_mean(jnp.asarray(x), jnp.asarray(mask)))
    for i in range(5):
        sel = x[i][mask[i]]
        want = sel.mean(axis=0) if len(sel) else np.zeros(3)
        np.testing.assert_allclose(got[i], want, rtol=1e-6, atol=1e-6)


def test_masked_mean_zero_row_is_zero_not_nan():
    x = jnp.ones((2, 3, 4))
    mask = jnp.array([[True, False, True], [False, False, False]])
    out = np.asarray(masked_mean(x, mask))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out[1], 0.0)


def test_masked_max_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 6, 2)).astype(np.float32)
    mask = rng.random((4, 6)) < 0.5
    got = np.asarray(masked_max(jnp.asarray(x), jnp.asarray(mask)))
    for i in range(4):
        sel = x[i][mask[i]]
        want = sel.max(axis=0) if len(sel) else np.zeros(2)
        np.testing.assert_allclose(got[i], want, rtol=1e-6)


def test_gather():
    feats = jnp.arange(12, dtype=jnp.float32).reshape(4, 3)
    out = np.asarray(gather(feats, jnp.array([2, 0, 2])))
    np.testing.assert_array_equal(out, np.asarray(feats)[[2, 0, 2]])


def test_spmm_mean_matches_dense(tiny_graph):
    g = tiny_graph
    feats = np.asarray(g.features)
    got = np.asarray(
        spmm_mean(g.features, g.edge_src, g.edge_dst, g.edge_mask, g.num_nodes)
    )
    neighbors = np.asarray(g.neighbors)
    degrees = np.asarray(g.degrees)
    for v in range(g.num_nodes):
        if degrees[v] == 0:
            np.testing.assert_allclose(got[v], 0.0)
        else:
            want = feats[neighbors[v, : degrees[v]]].mean(axis=0)
            np.testing.assert_allclose(got[v], want, rtol=1e-5)


def test_segment_mean_csr_padding_ignored():
    vals = jnp.array([[1.0], [3.0], [100.0]])
    src = jnp.array([0, 0, 1])
    mask = jnp.array([True, True, False])
    out = np.asarray(segment_mean_csr(vals, src, mask, 2))
    np.testing.assert_allclose(out[0], 2.0)
    np.testing.assert_allclose(out[1], 0.0)  # only a padding edge


def test_gather_mean_dma_impl_matches_take():
    """The streaming-DMA Pallas kernel is reachable via impl='dma'
    (round-1 review: it was advertised but unwired); interpret mode on CPU."""
    import jax

    from graphsage_tpu.ops.aggregate import gather_mean

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((40, 12)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 40, size=(6, 5)).astype(np.int32))
    mask = jnp.asarray(rng.random((6, 5)) < 0.8)
    got = gather_mean(feats, idx, mask, impl="dma")
    want = gather_mean(feats, idx, mask, impl="take")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_segment_mean_accumulates_in_f32_under_bf16():
    """Hub-degree scatter-adds must accumulate in f32: on TPU a bf16
    scatter-add saturates near 256x the addend scale (counts exactly,
    same-sign numerators progressively). CPU XLA does not reproduce the
    saturation, so this asserts the ACCUMULATION DTYPE in the jaxpr — no
    bf16 scatter/segment reduction may appear at all."""
    from graphsage_tpu.ops.aggregate import segment_mean_csr

    vals = jnp.ones((64, 4), jnp.bfloat16)
    src = jnp.zeros(64, jnp.int32)
    mask = jnp.ones(64, bool)
    jaxpr = jax.make_jaxpr(
        lambda v, s, m: segment_mean_csr(v, s, m, 2)
    )(vals, src, mask)

    def scatter_out_dtypes(jaxpr):
        out = []
        for eqn in jaxpr.eqns:
            if "scatter" in eqn.primitive.name:
                out.extend(v.aval.dtype for v in eqn.outvars)
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    out.extend(scatter_out_dtypes(sub.jaxpr))
        return out

    dtypes = scatter_out_dtypes(jaxpr.jaxpr)
    assert dtypes, "expected scatter-add reductions in segment_mean_csr"
    assert all(d == jnp.float32 for d in dtypes), dtypes

    # Semantics unchanged: mean of ones is 1, with the divisor the TRUE
    # degree (sum-exact +-1 values isolate the count path numerically).
    deg = 1000
    v2 = np.ones((deg, 4), np.float32)
    v2[1::2] *= -1.0
    out = segment_mean_csr(
        jnp.asarray(v2, jnp.bfloat16),
        jnp.zeros(deg, jnp.int32), jnp.ones(deg, bool), 2,
    )
    np.testing.assert_allclose(np.asarray(out, np.float32), 0.0, atol=1e-3)
