"""Stage bisection of the powerlaw_1m FORWARD (docs/ROOFLINE.md 5.1a).

The round-4 backward bisection (bisect_1m_backward.py) refuted the
"backward anomaly" framing: fwd-only is 66.6 ms of the 72.3 ms step —
value_and_grad adds ~6 ms and the isolated dW contraction is 1.1 ms.
So the cost is in the forward: sampling (three CSR lane-gather hops,
3.07M + 614K + 61K sampled slots) and the deepest-hop feature
aggregation (gather_mean over 3.07M requested rows from the 1M x 256
bf16 table). These probes separate them and test the gather-impl and
id-locality levers.

Config matches bench.py's powerlaw_1m row exactly: batch 4096,
fanouts (5, 10, 15) -> frontier 4096 / 61,440 / 614,400 / 3,072,000.

Run on the real chip: PYTHONPATH=/root/.axon_site:/root/repo \
    python benchmarks/bisect_1m_forward.py
"""
import time
import numpy as np
import jax, jax.numpy as jnp
from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.ops.aggregate import gather_mean

g = power_law_graph(num_nodes=1_000_000, num_edges=10_000_000, num_feats=256,
                    num_classes=32, seed=0, feature_dtype=jnp.bfloat16,
                    homophily=0.8)
model = GraphSAGE(in_dim=256, num_classes=32, hidden_dims=(256, 256, 256),
                  fanouts=(5, 10, 15), compute_dtype=jnp.bfloat16)
params = model.init(jax.random.PRNGKey(0))
seeds = jnp.asarray(np.arange(4096) % g.num_nodes, jnp.int32)
labels = jnp.take(g.labels, seeds)
key = jax.random.PRNGKey(1)
K = 10

print("pf(sampled layer0) =", model._sampled_layer0_project_first(
    g.num_nodes, 614_400 * 5, 2 * 256), flush=True)
print("ell_covers_all =", g.ell_covers_all,
      "ell_width =", g.neighbors.shape[-1], flush=True)

def timed(name, make_fn, *args):
    try:
        fn = jax.jit(make_fn)
        r = fn(*args); np.asarray(jax.device_get(r))
        t0 = time.perf_counter()
        r = fn(*args); np.asarray(jax.device_get(r))
        dt = (time.perf_counter() - t0 - 0.028) / K
        print(f"{name}: {dt*1e3:.2f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

def scan_block(body):
    def run(c, *args):
        def b(acc, i):
            return body(acc, i, *args), None
        return jax.lax.scan(b, c, jnp.arange(K))[0]
    return run

c0 = jnp.zeros((), jnp.float32)

# Precompute one frontier on device (sampling excluded from gather probes).
frontier = jax.jit(lambda k: model.sample(k, g, seeds))(key)
ids3 = frontier.ids[3]            # [3,072,000] deepest hop
mask3 = frontier.masks[3]
n_out = frontier.ids[2].shape[0]  # 614,400
ids2d = ids3.reshape(n_out, -1)
m2d = mask3.reshape(n_out, -1)

def _p(ids, acc):
    # data-dependent zero: keeps the gather inside the scan (no hoisting)
    return ids + (acc * 1e-20).astype(jnp.int32)

# 1. sampling only (all three hops)
timed("sample-only (3 hops)", scan_block(
    lambda acc, i, graph: acc + model.sample(
        jax.random.fold_in(key, i + (acc * 1e-20).astype(jnp.int32)),
        graph, seeds,
    ).ids[-1].sum() * 1e-12),
    c0, g)

# 2. deepest-hop fused gather+mean, the model's auto impl (bf16 table)
timed("gather_mean auto [3.07M rows]", scan_block(
    lambda acc, i, feats, ids, m: acc + gather_mean(
        feats, _p(ids, acc), m, impl="auto", bf16=True
    ).sum() * 1e-12),
    c0, g.features, ids2d, m2d)

# 3. same, forced unrolled (k separate gathers, no [B,k,F] transient)
timed("gather_mean unrolled", scan_block(
    lambda acc, i, feats, ids, m: acc + gather_mean(
        feats, _p(ids, acc), m, impl="unrolled", bf16=True
    ).sum() * 1e-12),
    c0, g.features, ids2d, m2d)

# 4. same, plain take ([B,k,F] transient + masked mean)
timed("gather_mean take", scan_block(
    lambda acc, i, feats, ids, m: acc + gather_mean(
        feats, _p(ids, acc), m, impl="take", bf16=True
    ).sum() * 1e-12),
    c0, g.features, ids2d, m2d)

# 5. raw row gather, no mean — the irreducible random-access cost
timed("raw take [3.07M x 512B rows]", scan_block(
    lambda acc, i, feats, ids: acc + jnp.take(
        feats, _p(ids, acc), axis=0
    ).astype(jnp.float32).sum() * 1e-12),
    c0, g.features, ids3)

# 6. raw row gather with SORTED ids — pure locality effect
ids3_sorted = jnp.sort(ids3)
timed("raw take SORTED ids", scan_block(
    lambda acc, i, feats, ids: acc + jnp.take(
        feats, _p(ids, acc), axis=0
    ).astype(jnp.float32).sum() * 1e-12),
    c0, g.features, ids3_sorted)

# 7. the sort itself (dedup-lever cost)
timed("sort 3.07M int32", scan_block(
    lambda acc, i, ids: acc + jnp.sort(_p(ids, acc)).sum() * 1e-12),
    c0, ids3)

# 8. project-first variant: full-table einsum + f32-row gather_mean
w0 = params.layers[0].weight.astype(jnp.bfloat16)[: 256]
def pf_body(acc, i, feats, w, ids, m):
    table = jnp.einsum("nf,fo->no", feats, w * (1 + acc * 1e-20),
                       preferred_element_type=jnp.float32)
    return acc + gather_mean(table, ids, m, impl="unrolled").sum() * 1e-12
timed("project-first (einsum 1Mx256x256 + f32 gather_mean)",
      scan_block(pf_body), c0, g.features, w0, ids2d, m2d)

# 9. forward on a FIXED frontier (sampling excluded): isolates layers
def fwd_fixed(acc, i, p, feats, f_ids, f_masks):
    from graphsage_tpu.models.graphsage import Frontier
    fr = Frontier(ids=tuple(_p(x, acc) for x in f_ids), masks=f_masks)
    p2 = jax.tree_util.tree_map(lambda w: w * (1 + acc * 1e-20), p)
    logits = model.forward(p2, feats, fr)
    return acc + logits.astype(jnp.float32).sum() * 1e-12
timed("forward, fixed frontier", scan_block(fwd_fixed),
      c0, params, g.features, frontier.ids, frontier.masks)

# 10. full forward incl. sampling (the 66.6 ms reference point)
def fwd_full(acc, i, p, graph):
    fr = model.sample(jax.random.fold_in(key, i), graph, seeds)
    p2 = jax.tree_util.tree_map(lambda w: w * (1 + acc * 1e-20), p)
    logits = model.forward(p2, graph.features, fr)
    return acc + logits.astype(jnp.float32).sum() * 1e-12
timed("forward incl. sampling", scan_block(fwd_full), c0, params, g)
