"""The examples/ scripts run end to end (broken examples are worse than
none — they are a new user's first contact). Each main() is importable and
takes argv, so they run in-process on the test platform."""

import runpy
import sys

import pytest

EXAMPLES = [
    ("01_train_cora.py", ["--steps", "30"]),
    ("02_unsupervised.py", ["20"]),
    ("03_distributed.py", []),
    ("04_serving.py", []),
    ("05_pod_ingestion.py", []),
    ("06_inductive.py", []),
    ("07_skew_and_samplers.py", []),
    ("08_layer0_modes.py", []),
]


@pytest.mark.parametrize("name,argv", EXAMPLES, ids=[e[0] for e in EXAMPLES])
def test_example_runs(name, argv, monkeypatch, capsys):
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "examples", name)
    monkeypatch.setattr(sys, "argv", [name, *argv])
    runpy.run_path(path, run_name="__main__")
    out = capsys.readouterr().out
    assert out.strip(), f"{name} printed nothing"
