"""Dataset loaders for the original Cora / Pubmed file formats.

Parsing semantics are pinned to the reference so that features, labels and
edge sets come out bit-identical (SURVEY.md §4.3 loader-parity requirement):

* Cora (reference graphsage/model.py:39-63): ``cora.content`` rows are
  ``<paper_id> <1433 x 0/1 feats> <label>``; node index = file line order;
  label ids assigned by first appearance in file order (quirk Q14);
  ``cora.cites`` rows ``<cited> <citing>`` become *undirected* edges.
* Pubmed (reference graphsage/model.py:108-135, quirk Q15): 2 header lines;
  the second header line maps feature names to columns via the token between
  the first and second ``:`` of each entry, shifted left by one; node rows are
  ``<id> label=<1..3> <word=value ...> summary=...`` — label stored as 0..2,
  the trailing summary field is skipped; the DIRECTED.cites file's direction
  is discarded (undirected adjacency), endpoints read from the ``paper:<id>``
  tokens in fields 1 and -1.

Loaders return host numpy; :func:`graphsage_tpu.data.graph.build_graph` turns
that into the device-resident padded container. A C++ fast path for the hot
TSV parse lives in ``graphsage_tpu/csrc`` (used when the shared library has
been built; these numpy parsers are the always-available fallback and the
semantics oracle).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np

from graphsage_tpu.data.graph import Graph, build_graph

CORA_NUM_NODES = 2708
CORA_NUM_FEATS = 1433
CORA_NUM_CLASSES = 7
PUBMED_NUM_NODES = 19717
PUBMED_NUM_FEATS = 500
PUBMED_NUM_CLASSES = 3


class RawDataset(NamedTuple):
    """Host-side parse result, before padding/device placement."""

    features: np.ndarray  # [N, F] float32
    labels: np.ndarray  # [N] int32
    edges: np.ndarray  # [E, 2] int64 (directed as read; loaders mirror later)
    num_classes: int


def _labels_by_first_appearance(names: list[str]) -> tuple[np.ndarray, int]:
    """Q14: label ids by first appearance in file order. ONE implementation,
    shared by the eager and lazy Cora parsers so the quirk cannot drift."""
    label_map: dict[str, int] = {}
    labels = np.empty(len(names), dtype=np.int32)
    for i, name in enumerate(names):
        labels[i] = label_map.setdefault(name, len(label_map))
    return labels, len(label_map)


def _cora_cites_edges(cites_path: str, node_map: dict[str, int]) -> np.ndarray:
    edge_list: list[tuple[int, int]] = []
    with open(cites_path) as f:
        for line in f:
            fields = line.split()
            if len(fields) < 2:
                continue
            edge_list.append((node_map[fields[0]], node_map[fields[1]]))
    return np.array(edge_list, dtype=np.int64).reshape(-1, 2)


def _pubmed_cites_edges(cite_path: str, node_map: dict[str, int]) -> np.ndarray:
    edge_list: list[tuple[int, int]] = []
    with open(cite_path) as f:
        f.readline()
        f.readline()
        for line in f:
            fields = line.strip().split("\t")
            if len(fields) < 2:
                continue
            edge_list.append((node_map[fields[1].split(":")[1]],
                              node_map[fields[-1].split(":")[1]]))
    return np.array(edge_list, dtype=np.int64).reshape(-1, 2)


def parse_cora(root: str | os.PathLike) -> RawDataset:
    """Parse cora.content / cora.cites from ``root``."""
    root = os.fspath(root)
    content_path = os.path.join(root, "cora.content")
    cites_path = os.path.join(root, "cora.cites")

    node_ids: list[str] = []
    label_names: list[str] = []
    feat_rows: list[np.ndarray] = []
    with open(content_path) as f:
        for line in f:
            fields = line.split()
            if not fields:
                continue
            node_ids.append(fields[0])
            feat_rows.append(np.array(fields[1:-1], dtype=np.float32))
            label_names.append(fields[-1])

    features = np.stack(feat_rows)
    labels, num_classes = _labels_by_first_appearance(label_names)
    node_map = {nid: i for i, nid in enumerate(node_ids)}
    edges = _cora_cites_edges(cites_path, node_map)
    return RawDataset(features, labels, edges, num_classes)


def parse_pubmed(root: str | os.PathLike) -> RawDataset:
    """Parse the Pubmed-Diabetes TSV pair from ``root`` (Q15 semantics)."""
    root = os.fspath(root)
    node_path = os.path.join(root, "Pubmed-Diabetes.NODE.paper.tab")
    cite_path = os.path.join(root, "Pubmed-Diabetes.DIRECTED.cites.tab")

    with open(node_path) as f:
        f.readline()  # banner line
        header = f.readline().rstrip("\n").split("\t")
        # Entry j like "numeric:w-word:0.0" names the feature stored at column
        # j-1 (the reference builds {name: j-1}; entry 0 is the label field and
        # lands at a throwaway index).
        feat_col = {entry.split(":")[1]: j - 1 for j, entry in enumerate(header)}

        body = f.read().splitlines()

    num_nodes = len(body)
    num_feats = len(feat_col) - 1  # minus the label pseudo-entry
    features = np.zeros((num_nodes, num_feats), dtype=np.float32)
    labels = np.empty(num_nodes, dtype=np.int32)
    node_map: dict[str, int] = {}
    for i, line in enumerate(body):
        fields = line.split("\t")
        node_map[fields[0]] = i
        labels[i] = int(fields[1].split("=")[1]) - 1  # 1..3 -> 0..2
        # fields[2:-1]: word=value pairs; the final field is the summary (skipped).
        for tok in fields[2:-1]:
            name, _, val = tok.partition("=")
            features[i, feat_col[name]] = float(val)

    edges = _pubmed_cites_edges(cite_path, node_map)
    return RawDataset(features, labels, edges, int(labels.max()) + 1)


def _parse(name: str, root, engine: str) -> RawDataset:
    """Route to the numpy or native C++ parser (semantics are identical;
    pinned by tests/test_native.py)."""
    py = {"cora": parse_cora, "pubmed": parse_pubmed}[name]
    if engine == "python":
        return py(root)
    from graphsage_tpu.data import native

    if engine == "native":
        return (native.parse_cora_native if name == "cora"
                else native.parse_pubmed_native)(root)
    if engine == "auto":
        if native.available():
            return (native.parse_cora_native if name == "cora"
                    else native.parse_pubmed_native)(root)
        return py(root)
    raise ValueError(f"unknown engine {engine!r}")


def load_cora(
    root: str | os.PathLike = "cora", engine: str = "auto", **build_kwargs
) -> Graph:
    """Load Cora into a device :class:`Graph` (undirected, Q14-compatible)."""
    raw = _parse("cora", root, engine)
    return build_graph(
        raw.features, raw.labels, raw.edges, num_classes=raw.num_classes,
        undirected=True, **build_kwargs,
    )


def load_pubmed(
    root: str | os.PathLike = "pubmed-data", engine: str = "auto", **build_kwargs
) -> Graph:
    """Load Pubmed into a device :class:`Graph` (undirected, Q15-compatible)."""
    raw = _parse("pubmed", root, engine)
    return build_graph(
        raw.features, raw.labels, raw.edges, num_classes=raw.num_classes,
        undirected=True, **build_kwargs,
    )


def _lazy_graph(num_nodes, num_feats, labels, edges, num_classes,
                **build_kwargs):
    """Host graph whose feature leaf is a ZERO-STRIDED view — shape/dtype
    descriptor at O(F) bytes, never a real table. Consumers must go through
    the row loader (the sharded trainers' ``feature_store=`` path guards
    the full-graph fallbacks against reading it)."""
    build_kwargs.setdefault("placement", "host")
    if build_kwargs["placement"] != "host":
        raise ValueError("lazy loading requires placement='host'")
    features = np.broadcast_to(
        np.zeros((1, num_feats), np.float32), (num_nodes, num_feats)
    )
    return build_graph(
        features, labels, edges, num_classes=num_classes, undirected=True,
        **build_kwargs,
    )


def _use_native_rows(engine: str, fn_name: str) -> bool:
    if engine not in ("auto", "python", "native"):
        raise ValueError(f"unknown engine {engine!r}")
    if engine == "python":
        return False
    from graphsage_tpu.data import native

    ok = native.available() and hasattr(native.load_library(), fn_name)
    if engine == "native" and not ok:
        raise RuntimeError("native loader unavailable (or .so predates the "
                           "lazy path — run make -C graphsage_tpu/csrc)")
    return ok


def load_cora_lazy(
    root: str | os.PathLike = "cora", engine: str = "auto", **build_kwargs
) -> tuple[Graph, object]:
    """Cora with ON-DEMAND feature rows: ``(graph, row_loader)``.

    The parse records each content line's byte offset instead of its
    feature columns; adjacency, labels, and the Q14 label map come out
    identical to :func:`load_cora` (test-pinned), but no ``[N, F]`` array
    is ever built — the graph's feature leaf is a zero-strided descriptor.
    ``row_loader(lo, hi)`` re-reads exactly those lines. Feed both to
    :func:`~graphsage_tpu.parallel.feature_store.shard_features_from_loader`
    + the sharded trainers' ``feature_store=`` argument: on an M-process
    pod each host then parses only its own ``N/M`` feature rows (peak host
    RAM ``N·F/M`` instead of the eager path's ``2·N·F``).
    """
    root = os.fspath(root)
    content_path = os.path.join(root, "cora.content")
    cites_path = os.path.join(root, "cora.cites")

    node_ids: list[str] = []
    label_names: list[str] = []
    offsets: list[int] = []
    num_feats = None
    with open(content_path, "rb") as f:
        off = f.tell()
        for line in iter(f.readline, b""):
            stripped = line.strip()
            if stripped:
                # Index pass: only the id (first token) and label (last) —
                # full O(F) tokenization of every line would cost each pod
                # host most of an eager parse, defeating the lazy split.
                node_ids.append(stripped.split(None, 1)[0].decode())
                label_names.append(stripped.rsplit(None, 1)[-1].decode())
                offsets.append(off)
                if num_feats is None:
                    num_feats = len(stripped.split()) - 2
            off = f.tell()
    labels, num_classes = _labels_by_first_appearance(label_names)
    node_map = {nid: i for i, nid in enumerate(node_ids)}
    edges = _cora_cites_edges(cites_path, node_map)
    offsets_arr = np.asarray(offsets, np.int64)
    lens_arr = np.append(
        offsets_arr[1:], os.path.getsize(content_path)
    ) - offsets_arr
    native_rows = _use_native_rows(engine, "gsl_cora_feature_rows")

    def row_loader(lo: int, hi: int) -> np.ndarray:
        if native_rows:
            from graphsage_tpu.data.native import cora_feature_rows_native

            return cora_feature_rows_native(
                content_path, offsets_arr[lo:hi], lens_arr[lo:hi], num_feats
            )
        out = np.empty((hi - lo, num_feats), np.float32)
        with open(content_path, "rb") as f:
            for j, off in enumerate(offsets_arr[lo:hi]):
                f.seek(int(off))
                fields = f.readline().split()
                out[j] = np.array(fields[1:-1], dtype=np.float32)
        return out

    graph = _lazy_graph(
        len(node_ids), num_feats, labels, edges, num_classes,
        **build_kwargs,
    )
    return graph, row_loader


def load_pubmed_lazy(
    root: str | os.PathLike = "pubmed-data", engine: str = "auto",
    **build_kwargs
) -> tuple[Graph, object]:
    """Pubmed with ON-DEMAND feature rows — same contract as
    :func:`load_cora_lazy`, with the Q15 quirks (header word map shifted by
    1, ``label=<n>``−1, summary field skipped) applied per row at load
    time."""
    root = os.fspath(root)
    node_path = os.path.join(root, "Pubmed-Diabetes.NODE.paper.tab")
    cite_path = os.path.join(root, "Pubmed-Diabetes.DIRECTED.cites.tab")

    offsets: list[int] = []
    labels_list: list[int] = []
    node_map: dict[str, int] = {}
    with open(node_path, "rb") as f:
        f.readline()  # banner
        # rstrip \r\n, not just \n: a CRLF file would otherwise leave \r on
        # the last header entry's word and every lookup of it would KeyError
        # (the eager text-mode parser and the native parser both strip it).
        header = f.readline().decode().rstrip("\r\n").split("\t")
        feat_col = {e.split(":")[1]: j - 1 for j, e in enumerate(header)}
        off = f.tell()
        for line in iter(f.readline, b""):
            if line.strip():
                fields = line.decode().split("\t", 2)  # index pass: id+label
                node_map[fields[0]] = len(offsets)
                labels_list.append(int(fields[1].split("=")[1]) - 1)
                offsets.append(off)
            off = f.tell()
    num_feats = len(feat_col) - 1  # minus the label pseudo-entry
    labels = np.asarray(labels_list, np.int32)
    edges = _pubmed_cites_edges(cite_path, node_map)
    offsets_arr = np.asarray(offsets, np.int64)
    lens_arr = np.append(
        offsets_arr[1:], os.path.getsize(node_path)
    ) - offsets_arr
    native_rows = _use_native_rows(engine, "gsl_pubmed_feature_rows")

    def row_loader(lo: int, hi: int) -> np.ndarray:
        if native_rows:
            from graphsage_tpu.data.native import pubmed_feature_rows_native

            return pubmed_feature_rows_native(
                node_path, offsets_arr[lo:hi], lens_arr[lo:hi], num_feats
            )
        out = np.zeros((hi - lo, num_feats), np.float32)
        with open(node_path, "rb") as f:
            for j, off in enumerate(offsets_arr[lo:hi]):
                f.seek(int(off))
                fields = f.readline().decode().split("\t")
                for tok in fields[2:-1]:  # last field = summary (skipped)
                    name, _, val = tok.partition("=")
                    out[j, feat_col[name]] = float(val)
        return out

    graph = _lazy_graph(
        len(offsets), num_feats, labels, edges, int(labels.max()) + 1,
        **build_kwargs,
    )
    return graph, row_loader
