"""Stage bisection of the powerlaw_1m layer0="cached" step (ROOFLINE 5.1b).

The cached flagship step measured 19.5 ms (vs 72.6 exact). Expected
decomposition from the 5.1a cost model: sampling 2 hops (61K + 614K lane
fetches) ~4 ms + the 614K-row hop-1 gather from the [1M, 256] bf16 cache
(slow region, ~12.4 ns/row) ~7.6 ms + layers ~1 ms + backward — leaving a
few ms unattributed. These probes pin each stage and test the two live
levers: windowed sampling (one lane fetch per parent) and the cache-gather
impl.

Config matches bench.py's powerlaw_1m_layer0_cached row: batch 4096,
fanouts (5, 10, 15) -> cached frontier 4096 / 61,440 / 614,400.

Run on the real chip: python benchmarks/bisect_1m_cached.py
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time
import dataclasses as dc
import numpy as np
import jax, jax.numpy as jnp
from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.data.graph import with_cached_layer0
from graphsage_tpu.models.graphsage import GraphSAGE, Frontier
from graphsage_tpu.train.config import TrainConfig
from graphsage_tpu.train.trainer import Trainer

g = power_law_graph(num_nodes=1_000_000, num_edges=10_000_000, num_feats=256,
                    num_classes=32, seed=0, feature_dtype=jnp.bfloat16,
                    homophily=0.8)
t0 = time.time()
g = with_cached_layer0(g)
np.asarray(jax.tree_util.tree_leaves(g.layer0_cache)[0][:1])
print("cache build:", round(time.time() - t0, 2), "s; dtype",
      g.layer0_cache.dtype, flush=True)

model = GraphSAGE(in_dim=256, num_classes=32, hidden_dims=(256, 256, 256),
                  fanouts=(5, 10, 15), compute_dtype=jnp.bfloat16,
                  layer0="cached")
params = model.init(jax.random.PRNGKey(0))
seeds = jnp.asarray(np.arange(4096) % g.num_nodes, jnp.int32)
key = jax.random.PRNGKey(1)
K = 10

def timed(name, make_fn, *args):
    try:
        fn = jax.jit(make_fn)
        r = fn(*args); np.asarray(jax.device_get(r))
        t0 = time.perf_counter()
        r = fn(*args); np.asarray(jax.device_get(r))
        dt = (time.perf_counter() - t0 - 0.028) / K
        print(f"{name}: {dt*1e3:.2f} ms", flush=True)
        return dt
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
        return float("nan")

def scan_block(body):
    def run(c, *args):
        def b(acc, i):
            return body(acc, i, *args), None
        return jax.lax.scan(b, c, jnp.arange(K))[0]
    return run

c0 = jnp.zeros((), jnp.float32)

def _p(ids, acc):
    # data-dependent zero: keeps the op inside the scan (no hoisting)
    return ids + (acc * 1e-20).astype(jnp.int32)

frontier = jax.jit(lambda k: model.sample(k, g, seeds))(key)
ids1 = frontier.ids[-1]   # [614,400] — the hop layer 1 consumes
print("frontier:", [int(x.shape[0]) for x in frontier.ids], flush=True)

# 1. full cached train step (the 19.5 ms reference point)
def step_probe(trainer):
    st0 = trainer.init_state()
    def run(st, graph):
        def body(st, i):
            st, loss = trainer._train_step(st, graph, seeds)
            return st, loss
        st, losses = jax.lax.scan(body, st, jnp.arange(K))
        return losses
    fn = jax.jit(run)
    r = fn(st0, trainer.graph); np.asarray(r)
    t0 = time.perf_counter(); r = fn(st0, trainer.graph); np.asarray(r)
    return (time.perf_counter() - t0 - 0.028) / K

tr = Trainer(model, g, TrainConfig(batch_size=4096, num_steps=1, log_every=0))
print(f"full step, floyd: {step_probe(tr)*1e3:.2f} ms", flush=True)

# 2. full cached step with WINDOWED sampling
mw = dc.replace(model, sampling="windowed")
trw = Trainer(mw, g, TrainConfig(batch_size=4096, num_steps=1, log_every=0))
print(f"full step, windowed: {step_probe(trw)*1e3:.2f} ms", flush=True)

# 3. sample-only, 2 hops, floyd
timed("sample-only floyd (2 hops)", scan_block(
    lambda acc, i, graph: acc + model.sample(
        jax.random.fold_in(key, i + (acc * 1e-20).astype(jnp.int32)),
        graph, seeds,
    ).ids[-1].sum() * 1e-12),
    c0, g)

# 4. sample-only, 2 hops, windowed
timed("sample-only windowed (2 hops)", scan_block(
    lambda acc, i, graph: acc + mw.sample(
        jax.random.fold_in(key, i + (acc * 1e-20).astype(jnp.int32)),
        graph, seeds,
    ).ids[-1].sum() * 1e-12),
    c0, g)

# 5. the cache gather alone: 614K rows from the [1M, 256] bf16 cache
timed("cache raw take [614K rows]", scan_block(
    lambda acc, i, cache, ids: acc + jnp.take(
        cache, _p(ids, acc), axis=0
    ).astype(jnp.float32).sum() * 1e-12),
    c0, g.layer0_cache, ids1)

# 6. cache gather + layer-0 project (the whole cached layer 0)
w0 = params.layers[0].weight
def l0_body(acc, i, cache, w, ids):
    rows = jnp.take(cache, _p(ids, acc), axis=0)
    h = jax.nn.relu(jnp.einsum(
        "nf,fo->no", rows, w.astype(jnp.bfloat16) * (1 + acc * 1e-20),
        preferred_element_type=jnp.float32))
    return acc + h.sum() * 1e-12
timed("cache take + project [614K x 256 x 256]",
      scan_block(l0_body), c0, g.layer0_cache, w0, ids1)

# 7. forward on a FIXED frontier (sampling excluded)
def fwd_fixed(acc, i, p, graph, f_ids, f_masks):
    fr = Frontier(ids=tuple(_p(x, acc) for x in f_ids), masks=f_masks)
    p2 = jax.tree_util.tree_map(lambda w: w * (1 + acc * 1e-20), p)
    logits = model.forward(p2, graph.features, fr, graph=graph)
    return acc + logits.astype(jnp.float32).sum() * 1e-12
timed("forward, fixed frontier", scan_block(fwd_fixed),
      c0, params, g, frontier.ids, frontier.masks)

# 8. value_and_grad on the fixed frontier (adds the backward)
labels = jnp.take(g.labels, seeds)
def vag_fixed(acc, i, p, graph, f_ids, f_masks):
    fr = Frontier(ids=tuple(_p(x, acc) for x in f_ids), masks=f_masks)
    def loss_fn(pp):
        logits = model.forward(pp, graph.features, fr, graph=graph)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.take_along_axis(logp, labels[:, None], axis=1).mean()
    p2 = jax.tree_util.tree_map(lambda w: w * (1 + acc * 1e-20), p)
    loss, grads = jax.value_and_grad(loss_fn)(p2)
    return acc + loss * 1e-12 + jax.tree_util.tree_reduce(
        lambda a, x: a + x.astype(jnp.float32).sum() * 1e-20, grads, 0.0)
timed("value_and_grad, fixed frontier", scan_block(vag_fixed),
      c0, params, g, frontier.ids, frontier.masks)

# 9. forward incl. sampling (floyd)
def fwd_full(acc, i, p, graph):
    fr = model.sample(jax.random.fold_in(key, i), graph, seeds)
    p2 = jax.tree_util.tree_map(lambda w: w * (1 + acc * 1e-20), p)
    logits = model.forward(p2, graph.features, fr, graph=graph)
    return acc + logits.astype(jnp.float32).sum() * 1e-12
timed("forward incl. sampling (floyd)", scan_block(fwd_full), c0, params, g)
