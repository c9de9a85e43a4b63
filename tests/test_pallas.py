"""Pallas kernels in interpret mode (CPU) vs the XLA oracle, plus the
dispatcher's platform/shape routing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphsage_tpu.ops.aggregate import gather_mean as gather_mean_dispatch
from graphsage_tpu.ops.pallas_gather import gather_mean as gather_mean_dma
from graphsage_tpu.ops.pallas_gather import gather_mean_reference
from graphsage_tpu.ops.pallas_onehot import onehot_gather_mean


@pytest.fixture(scope="module")
def case():
    rng = np.random.default_rng(7)
    feats = jnp.asarray(rng.normal(size=(91, 45)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 91, size=(21, 6)), jnp.int32)
    mask = jnp.asarray(rng.random((21, 6)) < 0.7)
    return feats, idx, mask


def test_onehot_kernel_forward(case):
    feats, idx, mask = case
    got = onehot_gather_mean(feats, idx, mask, 8, 32, False, True)
    want = gather_mean_reference(feats, idx, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_onehot_kernel_grad(case):
    feats, idx, mask = case
    g1 = jax.grad(lambda x: (onehot_gather_mean(x, idx, mask, 8, 32, False, True) ** 2).sum())(feats)
    g2 = jax.grad(lambda x: (gather_mean_reference(x, idx, mask) ** 2).sum())(feats)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_onehot_kernel_all_masked_row(case):
    feats, idx, _ = case
    mask = jnp.zeros(idx.shape, bool)
    out = np.asarray(onehot_gather_mean(feats, idx, mask, 8, 32, False, True))
    np.testing.assert_allclose(out, 0.0)


def test_dma_kernel_forward_and_grad(case):
    feats, idx, mask = case
    got = gather_mean_dma(feats, idx, mask, 8, True)
    want = gather_mean_reference(feats, idx, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)
    g1 = jax.grad(lambda x: (gather_mean_dma(x, idx, mask, 8, True) ** 2).sum())(feats)
    g2 = jax.grad(lambda x: (gather_mean_reference(x, idx, mask) ** 2).sum())(feats)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_dispatcher_take_matches_oracle(case):
    feats, idx, mask = case
    got = gather_mean_dispatch(feats, idx, mask, impl="take")
    want = gather_mean_reference(feats, idx, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_dispatcher_auto_on_cpu_uses_take(case):
    # On the CPU test platform auto must not route to a (interpreted) kernel.
    feats, idx, mask = case
    got = gather_mean_dispatch(feats, idx, mask, impl="auto")
    want = gather_mean_reference(feats, idx, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_dispatcher_rejects_unknown(case):
    feats, idx, mask = case
    with pytest.raises(ValueError):
        gather_mean_dispatch(feats, idx, mask, impl="magic")


def test_model_forward_same_for_impls(tiny_graph):
    """Model-level: forward with gather_impl=take equals the pre-fusion
    reshape/masked-mean math (exercised via fanout=None parity in
    test_model_parity) and is deterministic across calls."""
    from graphsage_tpu.models.graphsage import GraphSAGE

    g = tiny_graph
    model_take = GraphSAGE(in_dim=g.num_features, num_classes=g.num_classes,
                           hidden_dims=(8, 8), fanouts=(3, 3), gather_impl="take")
    params = model_take.init(jax.random.PRNGKey(0))
    fr = model_take.sample(jax.random.PRNGKey(1), g, jnp.arange(6, dtype=jnp.int32))
    a = model_take.forward(params, g.features, fr)
    b = model_take.forward(params, g.features, fr)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dispatcher_unrolled_matches_oracle(case):
    feats, idx, mask = case
    got = gather_mean_dispatch(feats, idx, mask, impl="unrolled")
    want = gather_mean_reference(feats, idx, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_dispatcher_unrolled_grad_matches(case):
    feats, idx, mask = case
    g1 = jax.grad(lambda x: (gather_mean_dispatch(x, idx, mask, impl="unrolled") ** 2).sum())(feats)
    g2 = jax.grad(lambda x: (gather_mean_reference(x, idx, mask) ** 2).sum())(feats)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)
