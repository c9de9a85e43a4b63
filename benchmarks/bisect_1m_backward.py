"""Sharper bisection of the ~69 ms powerlaw_1m backward (docs/ROOFLINE.md 5.1a).

Probes, each a relay-amortized 10-step scan block, printed as they complete:
fwd-only / value_and_grad-no-SGD / head-only grad / layer0-only grad /
isolated dW contraction / full trainer step. Together these separate
"AD of the deep frontier" from "optimizer+donation" from "one bad matmul
layout" — the three suspects left after the jaxpr-level refutations logged
in ROOFLINE 5.1a.

Run on the real chip: PYTHONPATH=/root/.axon_site:/root/repo \
    python benchmarks/bisect_1m_backward.py
"""
import time
import numpy as np
import jax, jax.numpy as jnp
import optax
from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.models.graphsage import GraphSAGE

g = power_law_graph(num_nodes=1_000_000, num_edges=10_000_000, num_feats=256,
                    num_classes=32, seed=0, feature_dtype=jnp.bfloat16, homophily=0.8)
model = GraphSAGE(in_dim=256, num_classes=32, hidden_dims=(256, 256, 256),
                  fanouts=(5, 10, 15), compute_dtype=jnp.bfloat16)
params = model.init(jax.random.PRNGKey(0))
seeds = jnp.asarray(np.arange(4096) % g.num_nodes, jnp.int32)
labels = jnp.take(g.labels, seeds)
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
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

def scan_block(body):
    def run(c, *args):
        def b(acc, i):
            return body(acc, i, *args), None
        return jax.lax.scan(b, c, jnp.arange(K))[0]
    return run

def loss_of(p, k, graph):
    fr = model.sample(k, graph, seeds)
    return model.loss(p, graph.features, fr, labels, graph=graph)

c0 = jnp.zeros((), jnp.float32)

# 1. fwd only (reference point)
timed("fwd-only", scan_block(
    lambda acc, i, p, graph: acc + loss_of(
        jax.tree_util.tree_map(lambda w: w * (1 + acc * 1e-20), p),
        jax.random.fold_in(key, i), graph) * 1e-6),
    c0, params, g)

# 2. value_and_grad, NO optimizer
def vag_body(acc, i, p, graph):
    l, grads = jax.value_and_grad(loss_of)(
        jax.tree_util.tree_map(lambda w: w * (1 + acc * 1e-20), p),
        jax.random.fold_in(key, i), graph)
    gn = sum((x.astype(jnp.float32) ** 2).sum() for x in jax.tree_util.tree_leaves(grads))
    return acc + l * 1e-6 + gn * 1e-20
timed("value_and_grad (no SGD)", scan_block(vag_body), c0, params, g)

# 3. grad w.r.t. HEAD only (everything below is constant)
def head_body(acc, i, p, graph):
    def lf(head):
        import dataclasses as dc
        p2 = type(p)(layers=p.layers, head=head)
        return loss_of(p2, jax.random.fold_in(key, i), graph)
    l, gh = jax.value_and_grad(lf)(p.head * (1 + acc * 1e-20))
    return acc + l * 1e-6 + (gh.astype(jnp.float32) ** 2).sum() * 1e-20
timed("grad head-only", scan_block(head_body), c0, params, g)

# 4. grad w.r.t. layer-0 weight only
def l0_body(acc, i, p, graph):
    def lf(w0):
        import dataclasses as dc
        lyr0 = dc.replace(p.layers[0], weight=w0)
        p2 = type(p)(layers=(lyr0,) + tuple(p.layers[1:]), head=p.head)
        return loss_of(p2, jax.random.fold_in(key, i), graph)
    l, gw = jax.value_and_grad(lf)(p.layers[0].weight * (1 + acc * 1e-20))
    return acc + l * 1e-6 + (gw.astype(jnp.float32) ** 2).sum() * 1e-20
timed("grad layer0-only", scan_block(l0_body), c0, params, g)

# 5. the dW0 contraction in isolation: [256,614400] @ [614400,256]
agg = jnp.asarray(np.random.default_rng(2).normal(size=(614400, 256)), jnp.bfloat16)
dpre = jnp.asarray(np.random.default_rng(3).normal(size=(614400, 256)), jnp.float32)
def dw_body(acc, i, a, d):
    out = jnp.einsum("bf,bd->fd", a.astype(jnp.bfloat16) * (1 + acc * 1e-20).astype(jnp.bfloat16), d,
                     preferred_element_type=jnp.float32)
    return acc + (out * out).sum() * 1e-20
timed("dW contraction [256,614K]x[614K,256]", scan_block(dw_body), c0, agg, dpre)

# 6. full trainer step (the measured 72 ms baseline)
from graphsage_tpu.train.config import TrainConfig
from graphsage_tpu.train.trainer import Trainer
tr = Trainer(model, g, TrainConfig(batch_size=4096, num_steps=1, log_every=0))
state = tr.init_state()
def step_block(state, graph):
    def b(carry, i):
        st, acc = carry
        st, loss = tr._train_step(st, graph, seeds)
        return (st, acc + loss * 1e-12), None
    (st, acc), _ = jax.lax.scan(b, (state, jnp.zeros((), jnp.float32)), jnp.arange(K))
    return acc
timed("full trainer step", step_block, state, g)
