"""Measure layer0="cached" vs exact floyd at the 1M flagship shape (TPU).

Run from anywhere: `python benchmarks/layer0_cached_1m.py`.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time, numpy as np, jax, jax.numpy as jnp
from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.data.graph import with_cached_layer0
from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.train.config import TrainConfig
from graphsage_tpu.train.trainer import Trainer

t0=time.time()
g = power_law_graph(num_nodes=1_000_000, num_edges=10_000_000, num_feats=256,
                    num_classes=32, seed=0, feature_dtype=jnp.bfloat16, homophily=0.8)
print("graph built", round(time.time()-t0,1), flush=True); t0=time.time()
gc = with_cached_layer0(g)
np.asarray(jax.tree_util.tree_leaves(gc.layer0_cache)[0][:1])
print("cache built", round(time.time()-t0,1), "dtype", gc.layer0_cache.dtype, flush=True)

def measure(graph, model, batch=4096, steps_per_block=50, blocks=2):
    trainer = Trainer(model, graph, TrainConfig(batch_size=batch, num_steps=1, log_every=0))
    state = trainer.init_state()
    frontier = model.sample(jax.random.PRNGKey(0), graph, jnp.zeros(batch, jnp.int32))
    eps = frontier.sampled_edges()
    it = trainer.batches()
    sb = [jnp.asarray(np.stack([next(it) for _ in range(steps_per_block)]), jnp.int32)
          for _ in range(blocks+1)]
    def block(state, seeds_all, graph):
        def body(st, seeds):
            st, loss = trainer._train_step(st, graph, seeds)
            return st, loss
        return jax.lax.scan(body, state, seeds_all)
    bj = jax.jit(block)
    state, losses = bj(state, sb[0], trainer.graph); np.asarray(losses)
    times=[]
    for b in range(1, blocks+1):
        t0=time.perf_counter(); state, losses = bj(state, sb[b], trainer.graph)
        np.asarray(losses); times.append(time.perf_counter()-t0)
    sps = min(times)/steps_per_block
    return dict(edges_per_step=eps, sec_per_step=sps, edges_per_s=eps/sps,
                final_loss=float(np.asarray(losses)[-1]))

model_c = GraphSAGE(in_dim=256, num_classes=32, hidden_dims=(256,256,256),
                    fanouts=(5,10,15), compute_dtype=jnp.bfloat16, layer0="cached")
r = measure(gc, model_c)
print("CACHED 1M:", r, flush=True)
model_e = GraphSAGE(in_dim=256, num_classes=32, hidden_dims=(256,256,256),
                    fanouts=(5,10,15), compute_dtype=jnp.bfloat16)
r2 = measure(g, model_e)
print("EXACT 1M:", r2, flush=True)
print("step speedup:", r2["sec_per_step"]/r["sec_per_step"], flush=True)
