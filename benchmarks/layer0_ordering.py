"""Measure the layer-0 ordering decision (project-first vs mean-first).

With a FROZEN feature table (reference model.py:70-71) the two exact
orderings of the sampled layer 0 have asymmetric backwards:

  mean-first     agg = mean(X[idx]); h = agg @ W
                 backward = one [f, B]·[B, d] matmul on the saved agg;
                 the table cotangent is never staged.
  project-first  T = X @ W; h = mean(T[idx])
                 backward = B*k-row scatter into [N, d] (dT) + dW over
                 ALL N rows.

`GraphSAGE._sampled_layer0_project_first` picks per shape with the
measured v5e constants; this harness is the calibration artifact — it
times full train steps (sample+fwd+bwd+SGD, scan-amortized) for both
forced orderings and the auto decision at the two shapes where the answer
differs:

  reddit shape  232K nodes, 602 bf16 feats, fanouts 10/25, batch 512
                (B*k = 128K < N: the cost model says mean-first ~3x)
  pubmed shape  19.7K nodes, 500 f32 feats, fanouts 10/25, batch 1024
                (B*k = 256K >> N: project-first keeps winning)

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/layer0_ordering.py
Methodology: docs/ROOFLINE.md (scan blocks, host-transfer barrier, 28 ms
relay round-trip subtracted).
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np


def measure_step(model, graph, batch, iters=100, repeats=3):
    import jax
    import jax.numpy as jnp

    from graphsage_tpu.train.config import TrainConfig
    from graphsage_tpu.train.trainer import Trainer

    trainer = Trainer(
        model, graph, TrainConfig(batch_size=batch, num_steps=1, log_every=0)
    )
    state = trainer.init_state()
    seeds = jnp.asarray(
        np.stack(
            [
                np.random.default_rng(i).integers(0, graph.num_nodes, batch)
                for i in range(iters)
            ]
        ),
        jnp.int32,
    )

    def block(state, seeds_all, graph):
        def body(st, s):
            st, loss = trainer._train_step(st, graph, s)
            return st, loss

        return jax.lax.scan(body, state, seeds_all)

    jb = jax.jit(block)
    state, losses = jb(state, seeds, graph)
    np.asarray(losses)  # compile + barrier
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state, losses = jb(state, seeds, graph)
        np.asarray(losses)
        times.append(time.perf_counter() - t0)
    return (min(times) - 0.028) / iters


def main():
    import jax.numpy as jnp

    from graphsage_tpu.data.synthetic import power_law_graph
    from graphsage_tpu.models.graphsage import GraphSAGE

    shapes = {
        "reddit": dict(
            graph=dict(
                num_nodes=232_965, num_edges=5_800_000, num_feats=602,
                num_classes=41, seed=0, feature_dtype=jnp.bfloat16,
                homophily=0.8,
            ),
            model=dict(
                in_dim=602, num_classes=41, hidden_dims=(128, 128),
                fanouts=(10, 25), compute_dtype=jnp.bfloat16,
            ),
            batch=512,
        ),
        "pubmed": dict(
            graph=dict(
                num_nodes=19_717, num_edges=44_338, num_feats=500,
                num_classes=3, seed=0, homophily=0.8,
            ),
            model=dict(
                in_dim=500, num_classes=3, hidden_dims=(128, 128),
                fanouts=(10, 25),
            ),
            batch=1024,
        ),
    }
    for name, cfg in shapes.items():
        graph = power_law_graph(**cfg["graph"])
        base = GraphSAGE(**cfg["model"])
        rows = {}
        for label, pf in (("auto", "auto"), ("project_first", True), ("mean_first", False)):
            model = dataclasses.replace(base, project_first=pf)
            rows[label] = measure_step(model, graph, cfg["batch"])
        slots = cfg["batch"] * int(np.prod([f for f in base.fanouts]))
        decided = base._sampled_layer0_project_first(
            graph.num_nodes, slots,
            base.in_dim * jnp.dtype(graph.features.dtype).itemsize,
        )
        print(f"[{name}] auto={'project' if decided else 'mean'}-first", flush=True)
        for label, sec in rows.items():
            print(f"  {label:14s} {sec * 1e3:7.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()
