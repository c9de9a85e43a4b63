"""Interaction lockdown: for every supported mode combination, the sampled
forward with sampling disabled (fanout=None, quirk Q7) must equal the
deterministic full-graph forward — this is the single invariant that ties
the minibatch path, the CSR path, and (via their own pinned tests) the
distributed paths to the same model."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.models.graphsage import GraphSAGE


@pytest.fixture(scope="module")
def graph():
    return power_law_graph(
        num_nodes=90, num_edges=260, num_feats=48, num_classes=4, seed=9
    )


MODES = [
    dict(aggregator="mean"),
    dict(aggregator="mean", concat_self=True),
    dict(aggregator="mean", self_loop=True),
    dict(aggregator="mean", project_first=False),
    dict(aggregator="mean", concat_self=True, project_first=False),
    dict(aggregator="maxpool", pool_dim=12),
    dict(aggregator="maxpool", pool_dim=12, concat_self=True),
    dict(aggregator="maxpool", pool_dim=12, self_loop=True),
    # LSTM: fanout=None returns full ELL rows in adjacency order — exactly
    # the sequence the full-graph ELL scan consumes, so the invariant is
    # exact here too (order-sensitivity cancels).
    dict(aggregator="lstm", pool_dim=12),
    dict(aggregator="lstm", pool_dim=12, concat_self=True),
    dict(aggregator="lstm", pool_dim=12, self_loop=True),
    # Shared-table layer 0 is exact (not just estimator-equal) with full
    # neighborhoods — so it belongs to the same invariant.
    dict(aggregator="mean", layer0="full"),
    dict(aggregator="mean", concat_self=True, layer0="full"),
    dict(aggregator="mean", self_loop=True, layer0="full"),
    dict(aggregator="maxpool", pool_dim=12, layer0="full"),
    dict(aggregator="maxpool", pool_dim=12, self_loop=True, layer0="full"),
    # Cached layer 0 holds the same exactness with full neighborhoods (the
    # cache IS the full-neighborhood mean) — mean-only by construction.
    dict(aggregator="mean", layer0="cached"),
    dict(aggregator="mean", concat_self=True, layer0="cached"),
    dict(aggregator="mean", self_loop=True, layer0="cached"),
]


@pytest.mark.parametrize("mode", MODES, ids=lambda m: "-".join(
    f"{k}={v}" for k, v in m.items()))
def test_sampled_no_fanout_equals_full_graph(graph, mode):
    model = GraphSAGE(
        in_dim=graph.num_features, num_classes=graph.num_classes,
        hidden_dims=(16, 16), fanouts=(None, None),
        matmul_precision="highest", gather_impl="take", **mode,
    )
    g = graph
    if mode.get("layer0") == "cached":
        from graphsage_tpu.data.graph import with_cached_layer0

        g = with_cached_layer0(graph, self_loop=mode.get("self_loop", False))
    params = model.init(jax.random.PRNGKey(11))
    full = model.forward_full_graph(params, g)
    frontier = model.sample(
        jax.random.PRNGKey(12), g, jnp.arange(g.num_nodes, dtype=jnp.int32)
    )
    fwd_kwargs = (
        {"graph": g} if mode.get("layer0") in ("full", "cached") else {}
    )
    sampled = model.forward(params, g.features, frontier, **fwd_kwargs)
    np.testing.assert_allclose(
        np.asarray(sampled), np.asarray(full), rtol=1e-4, atol=1e-5
    )
    # Embeddings agree the same way.
    emb_s = model.forward(params, g.features, frontier,
                          return_embeddings=True, **fwd_kwargs)
    emb_f = model.embed_full_graph(params, g)
    np.testing.assert_allclose(
        np.asarray(emb_s), np.asarray(emb_f), rtol=1e-4, atol=1e-5
    )
