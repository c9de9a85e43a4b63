"""Executable-reference parity: run the VENDORED reference implementation
(tests/reference_impl/, the SURVEY.md Appendix-A reconstruction — third-party
code, validated by execution) against the framework on the SAME synthetic
Cora files with COPIED weights, and assert per-layer allclose + trained-F1
agreement (SURVEY.md §7.2 step 6; VERDICT.md round-1 items 2 and 6).

This replaces the hand-derived numpy/torch oracles as the parity evidence:
the oracle here is the reference's own aggregators.py/encoders.py/model.py
running under torch.

Reference citations: aggregators.py:30-65 (mask.mm aggregation),
encoders.py:33-50 (relu(W @ combined.T)), model.py:20-37 (head + CE loss),
model.py:65-106 (run_cora driver semantics).
"""

import os
import random
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import graphsage_tpu as gt
from graphsage_tpu.models.graphsage import SAGEParams
from graphsage_tpu.models.layers import SAGELayerParams

REF_DIR = os.path.join(os.path.dirname(__file__), "reference_impl")

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def ref():
    """Import the vendored reference package (as top-level `graphsage`)."""
    sys.path.insert(0, REF_DIR)
    try:
        import graphsage.model as ref_model

        yield ref_model
    finally:
        sys.path.remove(REF_DIR)


@pytest.fixture(scope="module")
def full_cora_root(tmp_path_factory):
    """FULL-shape synthetic Cora (2708x1433, 5429 cites): the reference
    loader hardcodes those dims (model.py:41-42), so parity must run at the
    real shape — which also makes the trained-F1 comparison meaningful."""
    from graphsage_tpu.data.synthetic import synth_cora_files

    return synth_cora_files(tmp_path_factory.mktemp("fullcora"), seed=0)


@pytest.fixture(scope="module")
def cora_data(ref, full_cora_root, tmp_path_factory):
    """Load the SAME synthetic files through BOTH loaders."""
    # The reference loader hardcodes the relative path "cora/cora.content"
    # (model.py:41): give it a cwd with a `cora` symlink to the shared files.
    work = tmp_path_factory.mktemp("refcwd")
    os.symlink(full_cora_root, work / "cora")
    cwd = os.getcwd()
    os.chdir(work)
    try:
        feat_data, labels, adj_lists = ref.load_cora()
    finally:
        os.chdir(cwd)
    graph = gt.load_cora(full_cora_root)
    return feat_data, labels, adj_lists, graph


def _ref_model(ref, feat_data, adj_lists, num_classes, seed=0):
    """Build the reference 2-layer gcn=True model exactly as run_cora wires it
    (model.py:71-83), parameterized by the loaded data shapes."""
    torch.manual_seed(seed)
    n, f = feat_data.shape
    features = torch.nn.Embedding(n, f)
    features.weight = torch.nn.Parameter(
        torch.FloatTensor(feat_data), requires_grad=False
    )
    agg1 = ref.MeanAggregator(features, cuda=False)
    enc1 = ref.Encoder(features, f, 128, adj_lists, agg1, gcn=True, cuda=False)
    agg2 = ref.MeanAggregator(lambda nodes: enc1(nodes).t(), cuda=False)
    enc2 = ref.Encoder(
        lambda nodes: enc1(nodes).t(), enc1.embed_dim, 128, adj_lists, agg2,
        base_model=enc1, gcn=True, cuda=False,
    )
    sage = ref.SupervisedGraphSage(num_classes, enc2)
    return sage, enc1, enc2


def _copied_params(sage, enc1, enc2):
    """Framework params from the reference's weights. The reference stores
    [out, in] and left-multiplies (encoders.py:49); we store [in, out]."""
    w1 = enc1.weight.detach().numpy().T
    w2 = enc2.weight.detach().numpy().T
    head = sage.weight.detach().numpy().T
    return SAGEParams(
        layers=(
            SAGELayerParams(weight=jnp.asarray(w1)),
            SAGELayerParams(weight=jnp.asarray(w2)),
        ),
        head=jnp.asarray(head),
    )


def _finite_masks(adj_lists, n):
    """Rows where the reference's UNGUARDED mean stays finite with
    num_sample=None: layer-1 output is NaN exactly on isolated nodes
    (mask.div(0), quirk Q4); layer-2 additionally on their neighbors."""
    deg_ok = np.array([len(adj_lists[i]) > 0 for i in range(n)])
    ok2 = deg_ok & np.array(
        [all(deg_ok[u] for u in adj_lists[i]) if adj_lists[i] else False
         for i in range(n)]
    )
    return deg_ok, ok2


def test_per_layer_and_loss_parity(ref, cora_data):
    feat_data, labels, adj_lists, graph = cora_data
    n = graph.num_nodes

    # Loader parity: both parsers must produce identical arrays (Q14).
    np.testing.assert_array_equal(feat_data, np.asarray(graph.features))
    np.testing.assert_array_equal(labels.reshape(-1), np.asarray(graph.labels))

    sage, enc1, enc2 = _ref_model(ref, feat_data, adj_lists, graph.num_classes)
    enc1.num_sample = None
    enc2.num_sample = None
    params = _copied_params(sage, enc1, enc2)

    model = gt.GraphSAGE(
        in_dim=graph.num_features, num_classes=graph.num_classes,
        hidden_dims=(128, 128), fanouts=(None, None),
        matmul_precision="highest", gather_impl="take",
    )
    ok1, ok2 = _finite_masks(adj_lists, n)
    assert ok2.sum() > 0.8 * n  # the comparison covers most of the graph

    all_nodes = list(range(n))
    with torch.no_grad():
        # Layer 1 (enc1 == framework layer 0).
        ref_h1 = enc1(all_nodes).t().numpy()
        ref_h2 = enc2(all_nodes).t().numpy()
        ref_logits = sage.forward(all_nodes).numpy()

    model1 = gt.GraphSAGE(
        in_dim=graph.num_features, num_classes=graph.num_classes,
        hidden_dims=(128,), fanouts=(None,),
        matmul_precision="highest", gather_impl="take",
    )
    params1 = SAGEParams(layers=(params.layers[0],), head=params.head[:, :1])
    fw_h1 = np.asarray(model1.embed_full_graph(params1, graph))
    np.testing.assert_allclose(fw_h1[ok1], ref_h1[ok1], rtol=1e-4, atol=1e-5)

    fw_h2 = np.asarray(model.embed_full_graph(params, graph))
    np.testing.assert_allclose(fw_h2[ok2], ref_h2[ok2], rtol=1e-4, atol=1e-5)

    fw_logits = np.asarray(model.forward_full_graph(params, graph))
    np.testing.assert_allclose(fw_logits[ok2], ref_logits[ok2], rtol=1e-4, atol=1e-4)

    # End-to-end loss on a clean seed batch (model.py:35-37).
    seeds = np.nonzero(ok2)[0][:256]
    with torch.no_grad():
        ref_loss = float(
            sage.loss(
                list(seeds), torch.LongTensor(labels[seeds]).squeeze()
            )
        )
    frontier = model.sample(jax.random.PRNGKey(0), graph, jnp.asarray(seeds))
    fw_loss = float(
        model.loss(params, graph.features, frontier, jnp.asarray(labels[seeds]))
    )
    assert abs(ref_loss - fw_loss) < 1e-4 * max(1.0, abs(ref_loss))


def _train_reference(ref, feat_data, labels, adj_lists, num_classes, seed):
    """Train the vendored reference exactly as run_cora does (model.py:84-103),
    with the data already loaded; returns validation micro-F1 (model.py:105)."""
    from sklearn.metrics import f1_score

    np.random.seed(seed)
    random.seed(seed)
    torch.manual_seed(seed)
    n = feat_data.shape[0]
    sage, enc1, enc2 = _ref_model(ref, feat_data, adj_lists, num_classes, seed)
    rand_indices = np.random.permutation(n)
    val = rand_indices[1000:1500]  # the reference split (model.py:85-86)
    train = list(rand_indices[1500:])
    optimizer = torch.optim.SGD(
        filter(lambda p: p.requires_grad, sage.parameters()), lr=0.7
    )
    for _ in range(100):
        batch_nodes = train[:256]
        random.shuffle(train)
        optimizer.zero_grad()
        loss = sage.loss(
            batch_nodes, torch.LongTensor(labels[np.array(batch_nodes)]).squeeze()
        )
        loss.backward()
        optimizer.step()
    val_output = sage.forward(list(val))
    return f1_score(
        labels[val].reshape(-1),
        val_output.data.numpy().argmax(axis=1),
        average="micro",
    )


def test_trained_f1_parity(ref, cora_data):
    """Both implementations, same files, same split sizes, 5 seeds:
    final validation F1 must agree within a pooled-standard-error bound —
    the BASELINE.md 'trains to the same F1' claim, now actually tested
    (model.py:105). Round-2 VERDICT item 9: the old ``max(ptp, 0.04)``
    window would have passed a systematic 4-point gap; the pooled-SE
    criterion (tolerance ~1.5-2 F1 points at observed variances) fails it."""
    feat_data, labels, adj_lists, graph = cora_data
    seeds = [1, 2, 3, 4, 5]
    ref_f1 = [
        _train_reference(ref, feat_data, labels, adj_lists, graph.num_classes, s)
        for s in seeds
    ]
    fw_f1 = []
    for s in seeds:
        model = gt.GraphSAGE(
            in_dim=graph.num_features, num_classes=graph.num_classes,
            hidden_dims=(128, 128), fanouts=(10, 10),
        )
        cfg = gt.TrainConfig(
            batch_size=256, num_steps=100, seed=s, log_every=0,
            test_size=1000, val_size=500, batching="reference",
            eval_fanouts=(10, 10),  # the reference evaluates WITH sampling (§3.3)
        )
        res = gt.Trainer(model, graph, cfg).run(log=None)
        fw_f1.append(res["val_micro_f1"])

    ref_mean, fw_mean = float(np.mean(ref_f1)), float(np.mean(fw_f1))
    n = len(seeds)
    pooled_se = float(
        np.sqrt(np.var(ref_f1, ddof=1) / n + np.var(fw_f1, ddof=1) / n)
    )
    # ~2.5 sigma of the mean-difference distribution, floored at 1.5 F1
    # points (both runs are unseeded-init stochastic — quirk Q9); well
    # under the old 0.04 window, so a systematic 4-point gap now fails.
    tolerance = max(2.5 * pooled_se, 0.015)
    assert tolerance < 0.04, "variance blew past the old window — investigate"
    assert abs(ref_mean - fw_mean) <= tolerance, (
        f"trained-F1 divergence: reference {ref_f1} (mean {ref_mean:.4f}) vs "
        f"framework {fw_f1} (mean {fw_mean:.4f}), tolerance {tolerance:.4f}"
    )
    assert min(ref_f1 + fw_f1) > 0.5  # both actually learned
