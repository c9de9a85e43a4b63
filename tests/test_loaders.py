"""Loader parity: the numpy parsers must reproduce the reference's parsing
semantics exactly (SURVEY.md §4.3) — verified against a from-scratch oracle
that follows the reference's documented behavior (label map by first
appearance Q14, pubmed field quirks Q15, undirected adjacency)."""

import os
from collections import defaultdict

import numpy as np

from graphsage_tpu.data.loaders import load_cora, load_pubmed, parse_cora, parse_pubmed


def _oracle_cora(root):
    """Straight transcription of the documented reference parse semantics
    (SURVEY.md §2.1 #5): line-order node ids, first-appearance label ids,
    undirected dedup'd adjacency."""
    feats, labels, node_map, label_map = [], [], {}, {}
    with open(os.path.join(root, "cora.content")) as fp:
        for i, line in enumerate(fp):
            info = line.strip().split()
            feats.append([float(x) for x in info[1:-1]])
            node_map[info[0]] = i
            if info[-1] not in label_map:
                label_map[info[-1]] = len(label_map)
            labels.append(label_map[info[-1]])
    adj = defaultdict(set)
    with open(os.path.join(root, "cora.cites")) as fp:
        for line in fp:
            a, b = line.strip().split()
            adj[node_map[a]].add(node_map[b])
            adj[node_map[b]].add(node_map[a])
    return np.array(feats, dtype=np.float32), np.array(labels), adj


def _oracle_pubmed(root):
    with open(os.path.join(root, "Pubmed-Diabetes.NODE.paper.tab")) as fp:
        fp.readline()
        feat_map = {
            e.split(":")[1]: i - 1 for i, e in enumerate(fp.readline().split("\t"))
        }
        feats, labels, node_map = [], [], {}
        for i, line in enumerate(fp):
            info = line.split("\t")
            node_map[info[0]] = i
            labels.append(int(info[1].split("=")[1]) - 1)
            row = np.zeros(len(feat_map) - 1, dtype=np.float32)
            for tok in info[2:-1]:
                w, v = tok.split("=")
                row[feat_map[w]] = float(v)
            feats.append(row)
    adj = defaultdict(set)
    with open(os.path.join(root, "Pubmed-Diabetes.DIRECTED.cites.tab")) as fp:
        fp.readline()
        fp.readline()
        for line in fp:
            info = line.strip().split("\t")
            a = node_map[info[1].split(":")[1]]
            b = node_map[info[-1].split(":")[1]]
            adj[a].add(b)
            adj[b].add(a)
    return np.stack(feats), np.array(labels), adj


def _check_graph_matches(graph, feats, labels, adj):
    np.testing.assert_array_equal(np.asarray(graph.features), feats)
    np.testing.assert_array_equal(np.asarray(graph.labels), labels)
    neighbors = np.asarray(graph.neighbors)
    degrees = np.asarray(graph.degrees)
    for v in range(graph.num_nodes):
        assert set(neighbors[v, : degrees[v]].tolist()) == adj[v], f"node {v}"


def test_cora_loader_parity(synth_cora_root):
    feats, labels, adj = _oracle_cora(synth_cora_root)
    graph = load_cora(synth_cora_root)
    _check_graph_matches(graph, feats, labels, adj)
    assert graph.num_classes == 7


def test_pubmed_loader_parity(synth_pubmed_root):
    feats, labels, adj = _oracle_pubmed(synth_pubmed_root)
    graph = load_pubmed(synth_pubmed_root)
    _check_graph_matches(graph, feats, labels, adj)
    assert graph.num_classes == 3


def test_cora_raw_shapes(synth_cora_root):
    raw = parse_cora(synth_cora_root)
    assert raw.features.shape == (400, 64)
    assert raw.labels.shape == (400,)
    assert raw.edges.shape[1] == 2


def test_pubmed_raw_values_sparse(synth_pubmed_root):
    raw = parse_pubmed(synth_pubmed_root)
    # Sparse word=value format: most entries zero, stored ones positive.
    assert (raw.features > 0).sum() > 0
    assert (raw.features == 0).mean() > 0.5
    assert set(np.unique(raw.labels)) <= {0, 1, 2}
