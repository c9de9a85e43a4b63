"""Production levers for skewed graphs: windowed sampling + hub cache.

    python examples/07_skew_and_samplers.py

Power-law graphs stress two different walls (docs/ROOFLINE.md §5.1a):

* deep-hop SAMPLING pays one CSR lane fetch per sampled slot —
  ``GraphSAGE(sampling="windowed")`` cuts it to one fetch per PARENT
  (unbiased for the mean aggregation; the 1M preset step 72.6→63.1 ms);
* the compact sharded gather's per-pair buckets overflow on hub-skewed
  request lists — ``hub_cache_rows`` replicates the top-degree rows
  (frozen table ⇒ exact forever) so those requests never route.

This example trains the same graph three ways and prints the step-loss
trajectories plus the hub cache's planning numbers.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # run from anywhere

import numpy as np

import graphsage_tpu as gt
from graphsage_tpu.data.synthetic import power_law_graph
from graphsage_tpu.parallel.mesh import make_mesh


def main(argv=None):
    import jax

    g = power_law_graph(num_nodes=5000, num_edges=50000, num_feats=32,
                        num_classes=8, seed=0, homophily=0.8,
                        placement="host")
    cfg = gt.TrainConfig(batch_size=64, num_steps=30, log_every=0,
                         learning_rate=0.5, eval_fanouts=(5, 5))

    # 1) Exact floyd vs windowed sampling, single table.
    for sampling in ("floyd", "windowed"):
        model = gt.GraphSAGE(in_dim=32, num_classes=8, hidden_dims=(32, 32),
                             fanouts=(5, 5), sampling=sampling)
        res = gt.Trainer(model, g.to_device(), cfg).run(log=None)
        print(f"{sampling:9s}: final loss {res['losses'][-1]:.4f}  "
              f"val micro-F1 {res['val_micro_f1']:.3f}")

    # 2) Node-sharded compact exchange with the frozen hub cache. The
    # coverage fraction says how many requests the cache absorbs; its
    # real job is removing the heavy-tail head from the worst per-pair
    # bucket so capacity_slack can stay small.
    s = len(jax.devices())
    frac = gt.hub_request_fraction(np.asarray(g.degrees), 64)
    print(f"hub cache: top-64 rows cover {frac:.1%} of expected requests")
    model = gt.GraphSAGE(in_dim=32, num_classes=8, hidden_dims=(32, 32),
                         fanouts=(5, 5))
    trainer = gt.ShardedFeatureTrainer(
        model, g, cfg, make_mesh({"data": s}),
        gather_mode="compact", hub_cache_rows=64,
    )
    res = trainer.run(log=None)
    stats = trainer.memory_stats()
    print(f"sharded+hub over {s} device(s): final loss "
          f"{res['losses'][-1]:.4f}  val micro-F1 {res['val_micro_f1']:.3f}  "
          f"(hub bytes/chip {stats['hub_cache_bytes_per_chip']})")


if __name__ == "__main__":
    main()
