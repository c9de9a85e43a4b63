"""Native C++ loader parity with the numpy reference parsers.

Skipped when the toolchain can't build the shared library (the numpy path
is always available)."""

import numpy as np
import pytest

from graphsage_tpu.data import native
from graphsage_tpu.data.loaders import load_cora, parse_cora, parse_pubmed

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native loader not built"
)


def test_cora_native_parity(synth_cora_root):
    a = parse_cora(synth_cora_root)
    b = native.parse_cora_native(synth_cora_root)
    np.testing.assert_array_equal(a.features, b.features)
    np.testing.assert_array_equal(a.labels, b.labels)
    np.testing.assert_array_equal(a.edges, b.edges)
    assert a.num_classes == b.num_classes


def test_pubmed_native_parity(synth_pubmed_root):
    a = parse_pubmed(synth_pubmed_root)
    b = native.parse_pubmed_native(synth_pubmed_root)
    np.testing.assert_array_equal(a.features, b.features)
    np.testing.assert_array_equal(a.labels, b.labels)
    np.testing.assert_array_equal(a.edges, b.edges)


def test_native_csr_matches_python(synth_cora_root):
    from graphsage_tpu.data.graph import adjacency_from_edges

    raw = parse_cora(synth_cora_root)
    n = raw.features.shape[0]
    indptr, indices = native.build_csr_native(n, raw.edges, undirected=True)
    rows = adjacency_from_edges(n, raw.edges, undirected=True)
    for v in range(n):
        got = indices[indptr[v] : indptr[v + 1]].tolist()
        assert got == rows[v].tolist(), f"node {v}"


def test_loader_engine_param(synth_cora_root):
    g_native = load_cora(synth_cora_root, engine="native")
    g_python = load_cora(synth_cora_root, engine="python")
    np.testing.assert_array_equal(
        np.asarray(g_native.features), np.asarray(g_python.features)
    )
    np.testing.assert_array_equal(
        np.asarray(g_native.neighbors), np.asarray(g_python.neighbors)
    )
    with pytest.raises(ValueError):
        load_cora(synth_cora_root, engine="fortran")


def test_native_partitioner_parity():
    """C++ LPA assignment and BFS order == the numpy oracles exactly
    (csrc/partitioner.cpp vs parallel/halo.py)."""
    from graphsage_tpu.data.synthetic import power_law_graph
    from graphsage_tpu.parallel.halo import bfs_order, lpa_assign
    from graphsage_tpu.parallel.native_partition import (
        bfs_order_native,
        lpa_assign_native,
    )

    g = power_law_graph(num_nodes=3000, num_edges=18000, num_feats=8,
                        num_classes=6, seed=4, homophily=0.8)
    nat = lpa_assign_native(g, 8)
    if nat is None:
        pytest.skip("native partitioner unavailable")
    np.testing.assert_array_equal(nat, lpa_assign(g, 8))
    np.testing.assert_array_equal(bfs_order_native(g), bfs_order(g))


def test_native_partitioner_used_by_build(monkeypatch):
    """build_node_partition(order='lpa') routes through the native library
    when available and produces a valid plan."""
    from graphsage_tpu.data.synthetic import power_law_graph
    from graphsage_tpu.parallel.halo import build_node_partition
    from graphsage_tpu.parallel import native_partition

    if native_partition.load_library() is None:
        pytest.skip("native partitioner unavailable")
    g = power_law_graph(num_nodes=1000, num_edges=6000, num_feats=8,
                        num_classes=4, seed=2, homophily=0.8)
    part = build_node_partition(g, 4, order="lpa", sizing="per_offset")
    assert int(np.asarray(part.sizes).sum()) == g.num_nodes
    assert len(np.unique(np.asarray(part.stacked_index))) == g.num_nodes
