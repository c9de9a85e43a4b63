"""Round-4 ROOFLINE calibration points (VERDICT item 6).

* cora_lstm step at k=10 vs k=25 — calibrates §6's latency model (does
  the LSTM gap grow with the sequential chain length k?).
* powerlaw_1m step with bf16 vs int8 table — answers §5.3's question
  (the 1M gather is per-row-overhead-bound, so int8's byte saving should
  NOT move the step; record the number either way).

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/roofline_r4_points.py
"""
import time
import numpy as np
import jax, jax.numpy as jnp

from graphsage_tpu.data.graph import quantize_graph
from graphsage_tpu.data.synthetic import power_law_graph, synthetic_cora_graph
from graphsage_tpu.models.graphsage import GraphSAGE
from graphsage_tpu.train.config import TrainConfig
from graphsage_tpu.train.trainer import Trainer


def step_ms(graph, model, batch, steps_per_block=100, blocks=2, **cfg_kw):
    trainer = Trainer(model, graph, TrainConfig(
        batch_size=batch, num_steps=1, log_every=0, **cfg_kw))
    state = trainer.init_state()
    it = trainer.batches()
    seeds_blocks = [
        jnp.asarray(np.stack([next(it) for _ in range(steps_per_block)]),
                    jnp.int32)
        for _ in range(blocks + 1)
    ]

    def block(state, seeds_all, graph):
        def body(st, seeds):
            st, loss = trainer._train_step(st, graph, seeds)
            return st, loss
        return jax.lax.scan(body, state, seeds_all)

    bj = jax.jit(block)
    state, losses = bj(state, seeds_blocks[0], trainer.graph)
    np.asarray(losses)
    times = []
    for b in range(1, blocks + 1):
        t0 = time.perf_counter()
        state, losses = bj(state, seeds_blocks[b], trainer.graph)
        np.asarray(losses)
        times.append(time.perf_counter() - t0)
    return min(times) / steps_per_block * 1e3, float(np.asarray(losses)[-1])


cora = synthetic_cora_graph(2708, 1433, 5429, 7, seed=0)
for k in (10, 25):
    m = GraphSAGE(in_dim=1433, num_classes=7, hidden_dims=(128, 128),
                  fanouts=(k, k), aggregator="lstm", pool_dim=128,
                  concat_self=True)
    ms, fl = step_ms(cora, m, 256, steps_per_block=200,
                     optimizer="adam", learning_rate=0.005)
    print(f"cora_lstm k={k}: {ms:.2f} ms/step (final loss {fl:.2e})",
          flush=True)
    m_mean = GraphSAGE(in_dim=1433, num_classes=7, hidden_dims=(128, 128),
                       fanouts=(k, k))
    ms2, _ = step_ms(cora, m_mean, 256, steps_per_block=200)
    print(f"cora_mean k={k}: {ms2:.2f} ms/step  (lstm/mean = {ms/ms2:.1f}x)",
          flush=True)

g1m = power_law_graph(num_nodes=1_000_000, num_edges=10_000_000,
                      num_feats=256, num_classes=32, seed=0,
                      feature_dtype=jnp.bfloat16, homophily=0.8)
m1m = GraphSAGE(in_dim=256, num_classes=32, hidden_dims=(256, 256, 256),
                fanouts=(5, 10, 15), compute_dtype=jnp.bfloat16)
ms_bf16, _ = step_ms(g1m, m1m, 4096, steps_per_block=50)
print(f"powerlaw_1m bf16 table: {ms_bf16:.2f} ms/step", flush=True)
ms_int8, _ = step_ms(quantize_graph(g1m), m1m, 4096, steps_per_block=50)
print(f"powerlaw_1m int8 table: {ms_int8:.2f} ms/step "
      f"(int8/bf16 = {ms_int8/ms_bf16:.2f}x)", flush=True)
