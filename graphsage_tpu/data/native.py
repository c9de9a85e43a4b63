"""ctypes bindings to the native C++ data plane (csrc/graph_loader.cpp).

Provides fast-path TSV parsing (Cora/Pubmed formats) and CSR construction for
large graphs. Loading is lazy: the first call builds the shared library with
``make`` if it is missing; any failure falls back to the numpy parsers in
:mod:`graphsage_tpu.data.loaders` (which remain the semantics oracle — the
native parsers are pinned to them by parity tests).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from graphsage_tpu.data.loaders import RawDataset

_CSRC = os.path.join(os.path.dirname(__file__), "..", "csrc")
_LIB_PATH = os.path.abspath(os.path.join(_CSRC, "libgraphsage_loader.so"))
_lib: Optional[ctypes.CDLL] = None
_lib_error: Optional[str] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_CSRC)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # missing toolchain, build error, ...
        global _lib_error
        _lib_error = f"native build failed: {e}"
        return False


def load_library(build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_error
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not (build and _build()):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        _lib_error = str(e)
        return None

    lib.gsl_parse_cora.restype = ctypes.c_void_p
    lib.gsl_parse_cora.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.gsl_parse_pubmed.restype = ctypes.c_void_p
    lib.gsl_parse_pubmed.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.gsl_error.restype = ctypes.c_char_p
    lib.gsl_error.argtypes = [ctypes.c_void_p]
    for name in ("gsl_num_nodes", "gsl_num_feats", "gsl_num_classes", "gsl_num_edges"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.c_void_p]
    lib.gsl_copy_features.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.gsl_copy_labels.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)]
    lib.gsl_copy_edges.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.gsl_free.argtypes = [ctypes.c_void_p]

    lib.gsl_build_csr.restype = ctypes.c_void_p
    lib.gsl_build_csr.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int
    ]
    lib.gsl_csr_nnz.restype = ctypes.c_int64
    lib.gsl_csr_nnz.argtypes = [ctypes.c_void_p]
    lib.gsl_csr_copy_indptr.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.gsl_csr_copy_indices.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)]
    lib.gsl_csr_free.argtypes = [ctypes.c_void_p]

    for name in ("gsl_cora_feature_rows", "gsl_pubmed_feature_rows"):
        fn = getattr(lib, name, None)
        if fn is None:  # stale .so from before the lazy path; rebuild wins
            continue
        fn.restype = ctypes.c_int
        fn.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def _extract(lib: ctypes.CDLL, handle: int) -> RawDataset:
    try:
        err = lib.gsl_error(handle)
        if err:
            raise RuntimeError(f"native parse error: {err.decode()}")
        n = lib.gsl_num_nodes(handle)
        f = lib.gsl_num_feats(handle)
        e = lib.gsl_num_edges(handle)
        c = lib.gsl_num_classes(handle)
        feats = np.empty((n, f), dtype=np.float32)
        labels = np.empty((n,), dtype=np.int32)
        edges = np.empty((e, 2), dtype=np.int64)
        lib.gsl_copy_features(handle, feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        lib.gsl_copy_labels(handle, labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if e:
            lib.gsl_copy_edges(handle, edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return RawDataset(feats, labels, edges, int(c))
    finally:
        lib.gsl_free(handle)


def parse_cora_native(root: str | os.PathLike) -> RawDataset:
    lib = load_library()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_lib_error}")
    root = os.fspath(root)
    handle = lib.gsl_parse_cora(
        os.path.join(root, "cora.content").encode(),
        os.path.join(root, "cora.cites").encode(),
    )
    return _extract(lib, handle)


def parse_pubmed_native(root: str | os.PathLike) -> RawDataset:
    lib = load_library()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_lib_error}")
    root = os.fspath(root)
    handle = lib.gsl_parse_pubmed(
        os.path.join(root, "Pubmed-Diabetes.NODE.paper.tab").encode(),
        os.path.join(root, "Pubmed-Diabetes.DIRECTED.cites.tab").encode(),
    )
    return _extract(lib, handle)


def build_csr_native(
    num_nodes: int, edges: np.ndarray, undirected: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Deduplicated sorted CSR (indptr, indices) built in C++."""
    lib = load_library()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_lib_error}")
    edges = np.ascontiguousarray(edges, dtype=np.int64).reshape(-1, 2)
    handle = lib.gsl_build_csr(
        num_nodes,
        edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(edges),
        1 if undirected else 0,
    )
    try:
        nnz = lib.gsl_csr_nnz(handle)
        indptr = np.empty(num_nodes + 1, dtype=np.int64)
        indices = np.empty(nnz, dtype=np.int64)
        lib.gsl_csr_copy_indptr(handle, indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        if nnz:
            lib.gsl_csr_copy_indices(handle, indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return indptr, indices
    finally:
        lib.gsl_csr_free(handle)


def _feature_rows(fn_name: str, path, offsets: np.ndarray, lens: np.ndarray,
                  num_feats: int) -> np.ndarray:
    lib = load_library()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_lib_error}")
    if not hasattr(lib, fn_name):
        raise RuntimeError(
            f"the loaded libgraphsage_loader.so predates {fn_name} — "
            "rebuild with: make -C graphsage_tpu/csrc"
        )
    n = len(offsets)
    offsets = np.ascontiguousarray(offsets, np.int64)
    lens = np.ascontiguousarray(lens, np.int64)
    out = np.empty((n, num_feats), np.float32)
    rc = getattr(lib, fn_name)(
        os.fspath(path).encode(),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        num_feats,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc:
        raise RuntimeError(f"{fn_name} failed with code {rc} on {path}")
    return out


def cora_feature_rows_native(path, offsets, lens, num_feats) -> np.ndarray:
    """Parse the Cora content lines at ``offsets`` (byte lengths ``lens``)
    into ``[n, F]`` feature rows — the lazy loader's native fast path."""
    return _feature_rows("gsl_cora_feature_rows", path, offsets, lens, num_feats)


def pubmed_feature_rows_native(path, offsets, lens, num_feats) -> np.ndarray:
    """Q15 per-row parse (word=value pairs against the header map) of the
    NODE.tab lines at ``offsets`` — the lazy loader's native fast path."""
    return _feature_rows("gsl_pubmed_feature_rows", path, offsets, lens, num_feats)
