"""Host-side ingestion throughput: native C++ vs python parsers.

Runs on CPU (no TPU needed). Measures the eager full parses and the lazy
row loaders on the full-shape synthetic Cora/Pubmed files — the numbers
quoted in docs/DISTRIBUTED.md's ingestion section.

Usage: PYTHONPATH=/root/repo python benchmarks/ingest.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from graphsage_tpu.data.loaders import (
    load_cora_lazy,
    load_pubmed_lazy,
    parse_cora,
    parse_pubmed,
)
from graphsage_tpu.data import native
from graphsage_tpu.data.synthetic import synth_cora_files, synth_pubmed_files


def timeit(fn, repeats=3):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    croot = synth_cora_files(tempfile.mkdtemp(), seed=0)
    proot = synth_pubmed_files(tempfile.mkdtemp(), seed=0)
    cbytes = os.path.getsize(os.path.join(croot, "cora.content"))
    pbytes = os.path.getsize(
        os.path.join(proot, "Pubmed-Diabetes.NODE.paper.tab")
    )
    rows = {}

    t = timeit(lambda: parse_cora(croot))
    rows["cora_eager_python"] = {"s": t, "MB_s": cbytes / t / 1e6}
    if native.available():
        t = timeit(lambda: native.parse_cora_native(croot))
        rows["cora_eager_native"] = {"s": t, "MB_s": cbytes / t / 1e6}

    _, py_rows = load_cora_lazy(croot, engine="python")
    n_range = 1024
    t = timeit(lambda: py_rows(512, 512 + n_range))
    rows["cora_rows_python"] = {"s": t, "rows_s": n_range / t}
    if native.available():
        _, nat_rows = load_cora_lazy(croot, engine="native")
        t = timeit(lambda: nat_rows(512, 512 + n_range))
        rows["cora_rows_native"] = {"s": t, "rows_s": n_range / t}

    t = timeit(lambda: parse_pubmed(proot))
    rows["pubmed_eager_python"] = {"s": t, "MB_s": pbytes / t / 1e6}
    if native.available():
        t = timeit(lambda: native.parse_pubmed_native(proot))
        rows["pubmed_eager_native"] = {"s": t, "MB_s": pbytes / t / 1e6}

    _, py_p = load_pubmed_lazy(proot, engine="python")
    t = timeit(lambda: py_p(1000, 1000 + n_range))
    rows["pubmed_rows_python"] = {"s": t, "rows_s": n_range / t}
    if native.available():
        _, nat_p = load_pubmed_lazy(proot, engine="native")
        t = timeit(lambda: nat_p(1000, 1000 + n_range))
        rows["pubmed_rows_native"] = {"s": t, "rows_s": n_range / t}

    for name, r in rows.items():
        extra = (f"{r['MB_s']:.1f} MB/s" if "MB_s" in r
                 else f"{r['rows_s']:.0f} rows/s")
        print(f"{name:24s} {r['s'] * 1e3:9.2f} ms   {extra}")
    for prefix in ("cora_eager", "cora_rows", "pubmed_eager", "pubmed_rows"):
        py, nat = rows.get(prefix + "_python"), rows.get(prefix + "_native")
        if py and nat:
            print(f"{prefix}: native {py['s'] / nat['s']:.1f}x faster")


if __name__ == "__main__":
    main()
