"""Aggregation primitives vs straightforward numpy oracles."""

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


def test_segment_mean_counts_do_not_saturate_in_bf16():
    """Hub-degree counts must accumulate in f32: a bf16 scatter-add
    saturates at 256 (256+1 rounds back to 256), so a degree-1000 hub's
    mean divisor would be ~4x too small. Alternating +-1 values keep the
    SUM exactly representable, isolating the count path."""
    from graphsage_tpu.ops.aggregate import segment_mean_csr

    deg = 1000
    vals = np.ones((deg, 4), np.float32)
    vals[1::2] *= -1.0  # sum = 0 exactly, count = 1000
    src = np.zeros(deg, np.int32)
    mask = np.ones(deg, bool)
    out_bf16 = segment_mean_csr(
        jnp.asarray(vals, jnp.bfloat16), jnp.asarray(src), jnp.asarray(mask), 2
    )
    out_f32 = segment_mean_csr(
        jnp.asarray(vals), jnp.asarray(src), jnp.asarray(mask), 2
    )
    np.testing.assert_allclose(
        np.asarray(out_bf16, np.float32), np.asarray(out_f32), atol=1e-3
    )

    # And the mean of ones with ONE odd value out: divisor must be 1000.
    vals2 = np.zeros((deg, 4), np.float32)
    vals2[0] = 1000.0  # sum exactly 1000 (representable in bf16)
    out2 = segment_mean_csr(
        jnp.asarray(vals2, jnp.bfloat16), jnp.asarray(src), jnp.asarray(mask), 2
    )
    np.testing.assert_allclose(
        np.asarray(out2, np.float32)[0], 1.0, rtol=1e-2
    )
