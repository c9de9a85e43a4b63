"""Test harness config: force an 8-device CPU platform before JAX backends init.

Distributed/sharding tests run against a simulated 8-device CPU mesh
(SURVEY.md §4.5); numerical tests are platform-agnostic. The sandbox's axon
sitecustomize pins JAX_PLATFORMS=axon (remote TPU), so the env var alone is
not enough — ``jax.config.update`` after import wins. XLA_FLAGS must still be
set before the first backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synth_cora_root(tmp_path_factory):
    """Small synthetic Cora-format dataset written once per session."""
    from graphsage_tpu.data.synthetic import synth_cora_files

    root = tmp_path_factory.mktemp("cora")
    return synth_cora_files(root, num_nodes=400, num_feats=64, num_edges=900, seed=0)


@pytest.fixture(scope="session")
def synth_pubmed_root(tmp_path_factory):
    from graphsage_tpu.data.synthetic import synth_pubmed_files

    root = tmp_path_factory.mktemp("pubmed")
    return synth_pubmed_files(root, num_nodes=300, num_feats=50, num_edges=700, seed=0)


@pytest.fixture(scope="session")
def tiny_graph():
    """Hand-checkable 6-node graph used by exact-value tests."""
    from graphsage_tpu.data.graph import build_graph

    # Node 5 is isolated (exercises the zero-degree guard, quirk Q4).
    edges = np.array([[0, 1], [0, 2], [1, 2], [2, 3], [3, 4]])
    feats = np.arange(6 * 4, dtype=np.float32).reshape(6, 4)
    labels = np.array([0, 1, 0, 1, 0, 1])
    return build_graph(feats, labels, edges, num_classes=2)
