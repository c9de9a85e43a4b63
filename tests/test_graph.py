"""Graph container: adjacency building, padding, CSR/ELL agreement."""

import numpy as np
import pytest

from graphsage_tpu.data.graph import adjacency_from_edges, build_graph


def test_adjacency_undirected_dedup():
    rows = adjacency_from_edges(4, np.array([[0, 1], [1, 0], [0, 1], [2, 3]]))
    assert list(rows[0]) == [1]
    assert list(rows[1]) == [0]
    assert list(rows[2]) == [3]
    assert list(rows[3]) == [2]


def test_adjacency_directed():
    rows = adjacency_from_edges(3, np.array([[0, 1], [0, 2]]), undirected=False)
    assert list(rows[0]) == [1, 2]
    assert list(rows[1]) == []
    assert list(rows[2]) == []


def test_build_graph_views_agree(tiny_graph):
    g = tiny_graph
    neighbors = np.asarray(g.neighbors)
    degrees = np.asarray(g.degrees)
    indptr = np.asarray(g.indptr)
    edge_src = np.asarray(g.edge_src)
    edge_dst = np.asarray(g.edge_dst)
    edge_mask = np.asarray(g.edge_mask)

    assert g.num_nodes == 6
    assert degrees.tolist() == [2, 2, 3, 2, 1, 0]
    assert g.num_edges == 10  # 5 undirected edges -> 10 directed slots

    # ELL rows match CSR segments.
    for v in range(g.num_nodes):
        ell_row = sorted(neighbors[v, : degrees[v]].tolist())
        csr_row = sorted(edge_dst[indptr[v] : indptr[v + 1]].tolist())
        assert ell_row == csr_row
        assert all(edge_src[indptr[v] : indptr[v + 1]] == v)

    assert edge_mask[: g.num_edges].all()
    assert not edge_mask[g.num_edges :].any()
    # Padding slots stay in range for segment ops.
    assert edge_src.max() < g.num_nodes
    assert edge_dst.max() < g.num_nodes


def test_max_degree_padding_multiple():
    edges = np.array([[0, i] for i in range(1, 10)])
    feats = np.zeros((10, 3), dtype=np.float32)
    labels = np.zeros(10)
    g = build_graph(feats, labels, edges, num_classes=1)
    assert g.max_degree % 8 == 0
    assert g.max_degree >= 9


def test_degree_cap_truncates():
    edges = np.array([[0, i] for i in range(1, 10)])
    feats = np.zeros((10, 3), dtype=np.float32)
    labels = np.zeros(10)
    g = build_graph(feats, labels, edges, num_classes=1, max_degree=4)
    assert int(np.asarray(g.degrees)[0]) <= 8  # padded multiple of 8 caps at 8
    assert g.neighbors.shape[1] == 8


def test_labels_length_mismatch_raises():
    with pytest.raises(ValueError):
        build_graph(np.zeros((3, 2)), np.zeros(4), np.zeros((0, 2)))
