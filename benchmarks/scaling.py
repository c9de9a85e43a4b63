"""Scaling-efficiency harness: edges/s at 1..N devices.

Measures the DP(+TP) sampled training step over growing meshes and reports
edges/s and efficiency vs linear scaling (BASELINE target: >=80% from 1 chip
to N hosts). On real multi-chip hardware the numbers are true scaling; on a
CPU host with `--force-cpu N` virtual devices it validates the harness and
the sharding paths (compute scaling on an oversubscribed host is not
meaningful).

Usage:
  python benchmarks/scaling.py                  # devices as visible to JAX
  python benchmarks/scaling.py --force-cpu 8    # 8 virtual CPU devices
Prints one JSON object with per-mesh rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--force-cpu", type=int, default=None,
                        help="simulate N virtual CPU devices")
    parser.add_argument("--nodes", type=int, default=100_000)
    parser.add_argument("--edges", type=int, default=1_000_000)
    parser.add_argument("--feats", type=int, default=128)
    parser.add_argument("--batch", type=int, default=1024)
    parser.add_argument("--fanouts", type=int, nargs="+", default=[10, 10])
    parser.add_argument("--reps", type=int, default=20)
    parser.add_argument("--layer0", choices=("sampled", "full", "cached"),
                        default="sampled",
                        help="layer-0 formulation (the trainer auto-builds "
                        "the aggregate cache for 'cached')")
    args = parser.parse_args()

    if args.force_cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.force_cpu}"
        ).strip()

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from graphsage_tpu.data.synthetic import power_law_graph
    from graphsage_tpu.models.graphsage import GraphSAGE
    from graphsage_tpu.parallel.distributed import ShardedTrainer
    from graphsage_tpu.parallel.mesh import make_mesh
    from graphsage_tpu.train.config import TrainConfig
    from graphsage_tpu.utils.profiling import scaling_efficiency

    n_dev = len(jax.devices())
    graph = power_law_graph(
        num_nodes=args.nodes, num_edges=args.edges, num_feats=args.feats,
        num_classes=16, seed=0,
    )
    model = GraphSAGE(
        in_dim=args.feats, num_classes=16,
        hidden_dims=tuple(128 for _ in args.fanouts),
        fanouts=tuple(args.fanouts),
        layer0=args.layer0,
    )
    frontier = model.sample(
        jax.random.PRNGKey(0), graph, jnp.zeros(args.batch, jnp.int32)
    )
    edges_per_step = frontier.sampled_edges()

    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]
    rows = []
    base_eps = None
    for s in sizes:
        mesh = make_mesh({"data": s})
        trainer = ShardedTrainer(
            model, graph,
            TrainConfig(batch_size=args.batch, test_size=64, val_size=64,
                        log_every=0),
            mesh, model_axis=None,
        )
        state = trainer.init_state()
        # All reps run inside ONE dispatch (lax.scan): the axon relay adds a
        # fixed ~28 ms per jitted call, which at per-step granularity would
        # swamp the measurement (docs/ROOFLINE.md methodology).
        from jax.sharding import NamedSharding, PartitionSpec as P

        seeds_all = jnp.asarray(
            np.arange(args.reps * args.batch).reshape(args.reps, args.batch)
            % graph.num_nodes,
            jnp.int32,
        )
        seeds_sharding = NamedSharding(mesh, P(None, "data"))

        def block(st, seeds_scan, g):
            def body(s, seeds_one):
                s, loss = trainer._train_step(s, g, seeds_one)
                return s, loss

            return jax.lax.scan(body, st, seeds_scan)

        block_jit = jax.jit(
            block,
            in_shardings=(
                trainer._state_shardings(state),
                seeds_sharding,
                trainer._graph_sharding,
            ),
        )
        seeds_dev = jax.device_put(seeds_all, seeds_sharding)
        st, losses = block_jit(state, seeds_dev, trainer.graph)
        np.asarray(losses)  # compile + completion barrier
        t0 = time.perf_counter()
        st, losses = block_jit(state, seeds_dev, trainer.graph)
        np.asarray(losses)
        sec = (time.perf_counter() - t0) / args.reps
        eps = edges_per_step / sec
        if base_eps is None:
            base_eps = eps
        rows.append({
            "devices": s,
            "sec_per_step": round(sec, 6),
            "edges_per_s": round(eps, 1),
            "efficiency_vs_1": round(scaling_efficiency(base_eps, eps, s), 3),
        })

    print(json.dumps({
        "metric": "dp_scaling_edges_per_s",
        "platform": jax.default_backend(),
        "edges_per_step": edges_per_step,
        "rows": rows,
    }, indent=2))


if __name__ == "__main__":
    main()
