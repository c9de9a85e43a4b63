"""Benchmark: aggregation throughput (edges/s) of sampled training steps.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N}

The headline value is the Cora-config train step (the reference's shipped
run: 2-layer mean, fanout 10/10, 256-seed batch); ``detail`` carries the
same measurement for the Pubmed-intent config (fanout 10/25, batch 1024)
and the 100K-node power-law scale config.

Baseline: the reference aggregates ~66K sampled edges/s on CPU (fwd+bwd,
256-node batch, effective fanout 10/10 — BASELINE.md, measured on the
validated reconstruction). Here the same logical step — sample, gather,
2-layer mean aggregation, project, loss, backward, SGD — runs as one
compiled XLA program; throughput is counted over the sampled-edge slots the
step actually aggregates (our frontier is dedup-free, so the per-step edge
count is higher than the reference's post-dedup count; both numerator and
denominator are each system's real aggregation work).

Methodology (docs/ROOFLINE.md): the axon relay adds a FIXED ~28 ms per
jitted call, so steps run in long ``lax.scan`` blocks and the per-step time
is ``min(block_time) / steps_per_block``; an explicit host transfer of the
per-step losses is the completion barrier (``block_until_ready`` on donated
outputs can return early under the relay, so nothing is donated here).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _measure(graph, model, batch, steps_per_block, blocks, **cfg_kwargs):
    import jax
    import jax.numpy as jnp

    from graphsage_tpu.train.config import TrainConfig
    from graphsage_tpu.train.trainer import Trainer

    trainer = Trainer(
        model, graph,
        TrainConfig(batch_size=batch, num_steps=1, log_every=0, **cfg_kwargs),
    )
    state = trainer.init_state()
    frontier = model.sample(jax.random.PRNGKey(0), graph, jnp.zeros(batch, jnp.int32))
    edges_per_step = frontier.sampled_edges()

    batch_iter = trainer.batches()
    seeds_blocks = [
        jnp.asarray(
            np.stack([next(batch_iter) for _ in range(steps_per_block)]), jnp.int32
        )
        for _ in range(blocks + 1)
    ]

    def block(state, seeds_all, graph):
        def body(st, seeds):
            st, loss = trainer._train_step(st, graph, seeds)
            return st, loss

        return jax.lax.scan(body, state, seeds_all)

    block_jit = jax.jit(block)
    state, losses = block_jit(state, seeds_blocks[0], graph)  # compile block
    np.asarray(losses)

    times = []
    for b in range(1, blocks + 1):
        t0 = time.perf_counter()
        state, losses = block_jit(state, seeds_blocks[b], graph)
        np.asarray(losses)  # completion barrier
        times.append(time.perf_counter() - t0)

    sec_per_step = min(times) / steps_per_block
    return {
        "edges_per_step": edges_per_step,
        "sec_per_step": sec_per_step,
        "edges_per_s": edges_per_step / sec_per_step,
        "final_loss": float(np.asarray(losses)[-1]),
    }


def _measure_sharded(graph, model, batch, steps_per_block, blocks, mode,
                     slack=4.0):
    """Sharded-trainer step time on a ``{data: 1}`` mesh (single real chip):
    validates that the shard_map/all_to_all/psum_scatter machinery compiles
    and runs on the TPU backend, and measures its dispatch overhead vs the
    plain step (round-2 VERDICT item 3). ``mode``: "dense" | "compact"
    (ShardedFeatureTrainer) | "fully" (FullyShardedTrainer). The payloads
    are threaded as jit ARGS (closure constants would constant-fold)."""
    import jax
    import jax.numpy as jnp

    from graphsage_tpu.parallel.feature_store import (
        FullyShardedTrainer,
        ShardedFeatureTrainer,
    )
    from graphsage_tpu.parallel.mesh import make_mesh
    from graphsage_tpu.train.config import TrainConfig

    mesh = make_mesh({"data": 1})
    cfg = TrainConfig(batch_size=batch, num_steps=1, log_every=0)
    if mode == "fully":
        tr = FullyShardedTrainer(model, graph, cfg, mesh, capacity_slack=slack)
    else:
        tr = ShardedFeatureTrainer(model, graph, cfg, mesh, gather_mode=mode,
                                   capacity_slack=slack)

    # The trainer's own scanned block, payload threaded as jit ARGS (the
    # same dispatch run() uses — signature-proof against step-arg changes).
    def block(state, payload, seeds_all):
        state, losses, _violated = tr._train_block(state, payload, seeds_all)
        return state, losses

    args = (tr._block_payload(),)

    frontier = model.sample(jax.random.PRNGKey(0), graph,
                            jnp.zeros(batch, jnp.int32))
    edges_per_step = frontier.sampled_edges()
    batch_iter = tr.batches()
    seeds_blocks = [
        jnp.asarray(
            np.stack([next(batch_iter) for _ in range(steps_per_block)]),
            jnp.int32,
        )
        for _ in range(blocks + 1)
    ]
    block_jit = jax.jit(block)
    state = tr.init_state()
    state, losses = block_jit(state, *args, seeds_blocks[0])
    np.asarray(losses)
    times = []
    for b in range(1, blocks + 1):
        t0 = time.perf_counter()
        state, losses = block_jit(state, *args, seeds_blocks[b])
        np.asarray(losses)  # completion barrier
        times.append(time.perf_counter() - t0)
    sec_per_step = min(times) / steps_per_block
    return {
        "edges_per_step": edges_per_step,
        "sec_per_step": sec_per_step,
        "edges_per_s": edges_per_step / sec_per_step,
        "final_loss": float(np.asarray(losses)[-1]),
    }


def _measure_serving(graph, model, batch, steps_per_block, blocks,
                     sampled_steps_per_block=500):
    """ServingEngine request cost, measured for BOTH tiers.

    Table tier: gather + head matmul per padded request batch. The per-batch
    device time is a few µs, far below the ~28 ms relay constant, so the
    scan block runs ``steps_per_block`` (tens of thousands of) request
    batches with ids generated ON DEVICE from a folded key — block time
    then dominates the relay constant instead of vanishing into it (the
    round-3 bench clamped a negative difference to a meaningless 0.0 —
    VERDICT item 2). The result is asserted strictly positive and above
    the table-gather bytes/bandwidth floor; a violation raises (the row
    then records an error instead of a fake number).

    Sampled tier: the fallback path (sample + full sampled forward per
    request batch) measured the same way for contrast — docs/SERVING.md
    carries both numbers. Refresh cost (per model version) is wall-clock.
    """
    import jax
    import jax.numpy as jnp

    from graphsage_tpu.serve import ServingEngine

    t0 = time.perf_counter()
    eng = ServingEngine(
        model, graph, model.init(jax.random.PRNGKey(0)),
        batch_buckets=(batch,),
    )
    np.asarray(eng.table)  # completion barrier on the initial refresh
    build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    eng.refresh(eng.params)
    np.asarray(eng.table)
    refresh_s = max(time.perf_counter() - t0 - 0.028, 0.0)

    head = eng.params.head
    num_nodes = graph.num_nodes
    # Request ids come from a precomputed on-device pool indexed by step —
    # one tiny row lookup per batch — so the timed body is the served ops
    # (gather + head) and nothing else: generating ids with in-scan PRNG
    # would bias the per-request number upward by the threefry cost.
    POOL = 251  # coprime to steps_per_block so batches cycle, not repeat
    rng = np.random.default_rng(7)
    pools = [
        jnp.asarray(rng.integers(0, num_nodes, (POOL, batch)), jnp.int32)
        for _ in range(blocks + 1)
    ]

    def block(table, head, pool, c):
        def body(acc, i):
            ids = pool[i % POOL]
            rows = jnp.take(table, ids, axis=0)
            logits = jnp.einsum(
                "bd,dc->bc", rows, head.astype(rows.dtype),
                preferred_element_type=jnp.float32,
            )
            return acc + (logits * logits).sum() * (1 + acc * 1e-20), None

        return jax.lax.scan(body, c, jnp.arange(steps_per_block))[0]

    block_jit = jax.jit(block)
    z = jnp.zeros((), jnp.float32)
    np.asarray(block_jit(eng.table, head, pools[0], z))
    times = []
    for b in range(1, blocks + 1):
        t0 = time.perf_counter()
        np.asarray(block_jit(eng.table, head, pools[b], z))
        times.append(time.perf_counter() - t0 - 0.028)
    sec_per_batch = min(times) / steps_per_block
    # Sanity: the gather alone must read batch rows from the table; 2 TB/s
    # is comfortably above any single-chip HBM, so a value below this floor
    # can only be a measurement artifact.
    row_bytes = eng.table.shape[-1] * eng.table.dtype.itemsize
    floor = batch * row_bytes / 2e12
    if not sec_per_batch > floor:
        raise AssertionError(
            f"serving table-tier measurement {sec_per_batch:.3e}s/batch is "
            f"not above the {floor:.3e}s bytes/bandwidth floor "
            f"({batch} x {row_bytes}B rows at 2 TB/s) — block time did not "
            "dominate the relay constant; raise steps_per_block"
        )

    # Sampled tier: per-request-batch sample + sampled forward (the exact
    # ops of ServingEngine(mode="sampled")._serve, serve.py). Ids come
    # from the same pools; the PRNG in the body is the sampler's own —
    # part of the measured path. Guarded like the table tier: the relay
    # subtraction must not dominate the block.
    keys = jax.random.split(jax.random.PRNGKey(11), blocks + 1)

    def sampled_block(params, g, pool, key, c):
        def body(acc, i):
            frontier = model.sample(
                jax.random.fold_in(key, i), g, pool[i % POOL]
            )
            logits = model.forward(params, g.features, frontier)
            return acc + (logits.astype(jnp.float32) ** 2).sum() * (
                1 + acc * 1e-20
            ), None

        return jax.lax.scan(body, c, jnp.arange(sampled_steps_per_block))[0]

    sampled_jit = jax.jit(sampled_block)
    np.asarray(sampled_jit(eng.params, graph, pools[0], keys[0], z))
    stimes = []
    for b in range(1, blocks + 1):
        t0 = time.perf_counter()
        np.asarray(sampled_jit(eng.params, graph, pools[b], keys[b], z))
        stimes.append(time.perf_counter() - t0 - 0.028)
    sampled_sec = min(stimes) / sampled_steps_per_block
    if not sampled_sec > floor:
        raise AssertionError(
            f"serving sampled-tier measurement {sampled_sec:.3e}s/batch is "
            f"not above the {floor:.3e}s floor — raise "
            "sampled_steps_per_block so the block dominates the relay "
            "constant"
        )

    return {
        "request_batch": batch,
        "sec_per_request_batch": sec_per_batch,
        "us_per_request": sec_per_batch / batch * 1e6,
        "sampled_tier_sec_per_request_batch": sampled_sec,
        "table_vs_sampled_speedup": sampled_sec / sec_per_batch,
        "table_refresh_sec": refresh_s,
        "engine_build_sec": build_s,
        "floor_sec_per_batch": floor,
    }


def _measure_full_batch(graph, model, steps_per_block, blocks):
    """Full-batch (num_sample=None) training throughput: every step
    aggregates ALL edges once per layer via the degree-bucketed scatter-free
    SpMM, so the edge denominator is num_edges * num_layers."""
    import jax
    import numpy as np

    from graphsage_tpu.train.config import TrainConfig
    from graphsage_tpu.train.full_graph import FullGraphTrainer

    trainer = FullGraphTrainer(
        model, graph, TrainConfig(num_steps=1, log_every=0)
    )
    state = trainer.init_state()
    state, losses = trainer._jit_block(state, steps_per_block, trainer._payload)
    np.asarray(losses)  # compile barrier
    times = []
    for _ in range(blocks):
        t0 = time.perf_counter()
        state, losses = trainer._jit_block(
            state, steps_per_block, trainer._payload
        )
        np.asarray(losses)
        times.append(time.perf_counter() - t0)
    sec_per_step = min(times) / steps_per_block
    edges_per_step = graph.num_edges * model.num_layers
    return {
        "edges_per_step": edges_per_step,
        "sec_per_step": sec_per_step,
        "edges_per_s": edges_per_step / sec_per_step,
        "final_loss": float(np.asarray(losses)[-1]),
    }


def _try_row(thunk, label):
    """Run one bench row, converting a crash (relay hiccup, OOM, compile
    failure) into a recorded error row instead of killing the WHOLE bench —
    the driver needs the single JSON line even when one config fails."""
    import sys
    import traceback

    try:
        return thunk()
    except Exception as e:  # noqa: BLE001 — the point is to survive anything
        print(f"BENCH ROW FAILED [{label}]: {type(e).__name__}: {e}",
              file=sys.stderr)
        traceback.print_exc(file=sys.stderr)
        return {
            "error": f"{type(e).__name__}: {e}",
            "edges_per_step": 0,
            "sec_per_step": float("nan"),
            "edges_per_s": 0.0,
            "final_loss": float("nan"),
        }


def main() -> None:
    import jax

    from graphsage_tpu.data.synthetic import (
        power_law_graph,
        synthetic_cora_graph,
        synthetic_pubmed_graph,
    )
    from graphsage_tpu.models.graphsage import GraphSAGE

    BASELINE_EDGES_PER_S = 66_000.0  # BASELINE.md, reference on CPU

    # Headline: Cora-like synthetic (binary bag-of-words, homophilous edges
    # so the trained loss is meaningful, not just the step timing).
    cora = _try_row(lambda: _measure(
        synthetic_cora_graph(2708, 1433, 5429, 7, seed=0),
        GraphSAGE(in_dim=1433, num_classes=7, hidden_dims=(128, 128), fanouts=(10, 10)),
        batch=256, steps_per_block=500, blocks=4,
    ), "cora")

    pubmed = _try_row(lambda: _measure(
        synthetic_pubmed_graph(19717, 500, 44338, 3, seed=0),
        GraphSAGE(in_dim=500, num_classes=3, hidden_dims=(128, 128), fanouts=(10, 25)),
        batch=1024, steps_per_block=200, blocks=2,
    ), "pubmed")

    # The reference's SHIPPED Pubmed semantics (quirk Q1: num_samples=25
    # is computed but 10 is passed — effective fanout 10/10). Promoted to a
    # per-run row so a regression in the shipped-parity config surfaces
    # between rounds (round-3 VERDICT item 5 / weak 6).
    pubmed_shipped = _try_row(lambda: _measure(
        synthetic_pubmed_graph(19717, 500, 44338, 3, seed=0),
        GraphSAGE(in_dim=500, num_classes=3, hidden_dims=(128, 128), fanouts=(10, 10)),
        batch=1024, steps_per_block=200, blocks=2,
    ), "pubmed_shipped")

    # Power-law rows carry homophily=0.8 from round 3 on, so the learning
    # floors below are meaningful (with label-random edges the shipped
    # pure-neighbor-mean mode cannot beat chance and a broken-convergence
    # regression would be invisible). Sampling/aggregation work per step is
    # shape-identical; throughput rows stay comparable to r1/r2.
    powerlaw = _try_row(lambda: _measure(
        power_law_graph(num_nodes=100_000, num_edges=1_000_000, num_feats=128,
                        num_classes=16, seed=0, homophily=0.8),
        GraphSAGE(in_dim=128, num_classes=16, hidden_dims=(128, 128), fanouts=(10, 10)),
        batch=1024, steps_per_block=200, blocks=2,
    ), "powerlaw_100k")

    import jax.numpy as jnp

    # BASELINE config #5 shape: Reddit-scale (232K nodes, ~11.6M directed
    # slots, 602 feats, 41 classes), bf16 table + compute.
    reddit_graph = power_law_graph(
        num_nodes=232_965, num_edges=5_800_000, num_feats=602,
        num_classes=41, seed=0, feature_dtype=jnp.bfloat16, homophily=0.8,
    )
    reddit_model = GraphSAGE(in_dim=602, num_classes=41, hidden_dims=(128, 128),
                             fanouts=(10, 25), compute_dtype=jnp.bfloat16)
    reddit = _try_row(lambda: _measure(reddit_graph, reddit_model,
                      batch=512, steps_per_block=100, blocks=2), "reddit")

    # BASELINE config #4 at full scale: 1M nodes / 20M directed slots,
    # 3-layer mean.
    graph_1m = power_law_graph(num_nodes=1_000_000, num_edges=10_000_000,
                               num_feats=256, num_classes=32, seed=0,
                               feature_dtype=jnp.bfloat16, homophily=0.8)
    model_1m = GraphSAGE(in_dim=256, num_classes=32,
                         hidden_dims=(256, 256, 256),
                         fanouts=(5, 10, 15), compute_dtype=jnp.bfloat16)
    powerlaw_1m = _try_row(lambda: _measure(graph_1m, model_1m,
                           batch=4096, steps_per_block=50, blocks=2),
                           "powerlaw_1m")

    # Same config with the int8 feature table (ops/quantize.py): half the
    # deepest-hop gather bytes vs bf16 and a 512->260 MB resident table;
    # whether the gather TIME moves tells us if it is bandwidth- or
    # locality-bound at this shape (ROOFLINE §5 headroom 3).
    from graphsage_tpu.data.graph import quantize_graph

    powerlaw_1m_q = _try_row(lambda: _measure(quantize_graph(graph_1m), model_1m,
                             batch=4096, steps_per_block=50, blocks=2),
                             "powerlaw_1m_int8")

    # Windowed sampling (ops/sampling.py:_windowed_sample): one CSR lane
    # fetch per parent instead of one per sampled slot — the measured
    # escape from the deep-hop sampling stage at this scale (ROOFLINE
    # §5.1a; exact-uniform floyd stays the headline row). Mean-estimator
    # unbiased; converged loss sits slightly above floyd's (correlated
    # within-window draws), gated by the same 0.8 floor.
    import dataclasses as _dc0

    powerlaw_1m_w = _try_row(lambda: _measure(
        graph_1m, _dc0.replace(model_1m, sampling="windowed"),
        batch=4096, steps_per_block=50, blocks=2), "powerlaw_1m_windowed")

    # Cached layer-0 (data.graph.with_cached_layer0 + layer0="cached"):
    # the feature table is frozen (reference model.py:70-71) and the mean
    # aggregator linear, so the deepest hop's full-neighborhood mean
    # D^-1 A X is a per-node CONSTANT — built once, amortized across the
    # run; per step the deepest sampling hop, its 3.07M-row gather and
    # the backward scatter all disappear (ROOFLINE §5.1b). edges_per_step
    # counts only the per-step sampled hops (the deepest hop's work is
    # genuinely gone, not hidden); exact_equivalent_edges_per_s divides
    # the EXACT model's per-step edge work by the cached step time —
    # valid because cached computes the sampled estimator's exact
    # expectation at that hop (test-pinned equal at covering fanouts).
    def _cached_1m_row():
        from graphsage_tpu.data.graph import with_cached_layer0

        t0 = time.time()
        gc = with_cached_layer0(graph_1m)
        np.asarray(jax.tree_util.tree_leaves(gc.layer0_cache)[0][:1])
        build_sec = time.time() - t0
        row = _measure(gc, _dc0.replace(model_1m, layer0="cached"),
                       batch=4096, steps_per_block=50, blocks=2)
        row["cache_build_sec"] = round(build_sec, 3)
        # The two escapes compose: windowed sampling cuts the remaining
        # sample stage 3.6 -> 1.2 ms on top of the cached layer 0
        # (measured decomposition: benchmarks/bisect_1m_cached.py,
        # ROOFLINE §5.1b). Same cache, same graph — one extra measure.
        roww = _measure(
            gc, _dc0.replace(model_1m, layer0="cached", sampling="windowed"),
            batch=4096, steps_per_block=50, blocks=2)
        row["windowed_sec_per_step"] = roww["sec_per_step"]
        row["windowed_final_loss"] = roww["final_loss"]
        if not (roww["final_loss"] < 0.8):  # same floor as the parent row
            raise RuntimeError(
                f"cached+windowed variant broke convergence: "
                f"final_loss={roww['final_loss']}")
        if "error" not in powerlaw_1m:
            row["step_speedup_vs_exact"] = round(
                powerlaw_1m["sec_per_step"] / row["sec_per_step"], 3)
            row["exact_equivalent_edges_per_s"] = (
                powerlaw_1m["edges_per_step"] / row["sec_per_step"])
        return row

    powerlaw_1m_c = _try_row(_cached_1m_row, "powerlaw_1m_layer0_cached")
    del graph_1m

    # Full-batch training at the 100K power-law shape — the degree-bucketed
    # scatter-free SpMM path (no reference counterpart: the framework's
    # num_sample=None training capability at scale).
    fullbatch = _try_row(lambda: _measure_full_batch(
        power_law_graph(num_nodes=100_000, num_edges=1_000_000, num_feats=128,
                        num_classes=16, seed=0, homophily=0.8),
        GraphSAGE(in_dim=128, num_classes=16, hidden_dims=(128, 128),
                  fanouts=(None, None)),
        steps_per_block=10, blocks=3,
    ), "fullbatch")

    # Sharded trainers on the real chip ({data:1} mesh — round-2 VERDICT
    # item 3): proves the shard_map/all_to_all/psum_scatter paths compile
    # and run on this backend, and measures their overhead vs the plain
    # step. The S=8 communication volumes (the quantity multi-chip time
    # would be spent on) come from sharded_comm_stats.
    from graphsage_tpu.parallel.feature_store import sharded_comm_stats

    cora_graph = synthetic_cora_graph(2708, 1433, 5429, 7, seed=0)
    cora_model = GraphSAGE(in_dim=1433, num_classes=7, hidden_dims=(128, 128),
                           fanouts=(10, 10))
    sharded_rows = {}
    for mode in ("dense", "compact", "fully"):
        sharded_rows[mode] = _try_row(lambda m=mode: _measure_sharded(
            cora_graph, cora_model, batch=256, steps_per_block=200, blocks=2,
            mode=m,
        ), f"sharded_{mode}")
        sharded_rows[mode]["overhead_vs_plain_step_ms"] = round(
            (sharded_rows[mode]["sec_per_step"] - cora["sec_per_step"]) * 1e3, 4
        )
    comm_s8 = sharded_comm_stats(cora_model, 256, 8, fully_sharded=True)

    # Serving: request cost on the Pubmed shape for BOTH tiers (table =
    # gather + head; sampled = sample + forward). The table tier's µs-scale
    # batches need tens of thousands of scanned request batches per dispatch
    # to dominate the 28 ms relay constant (round-3 VERDICT item 2).
    serving = _try_row(lambda: _measure_serving(
        synthetic_pubmed_graph(19717, 500, 44338, 3, seed=0),
        GraphSAGE(in_dim=500, num_classes=3, hidden_dims=(128, 128),
                  fanouts=(10, 25)),
        batch=1024, steps_per_block=20000, blocks=2,
    ), "serving")

    # Shared-table layer-0 on the Pubmed-intent shape (ROOFLINE §5.1): the
    # full-graph CSR layer 0 replaces 256K sampled deepest-hop rows with
    # 89K scatter-free edge slots. Denominator counts the edges actually
    # aggregated (sampled hops + one full pass).
    pubmed_graph = synthetic_pubmed_graph(19717, 500, 44338, 3, seed=0)
    pubmed_model_full = GraphSAGE(
        in_dim=500, num_classes=3, hidden_dims=(128, 128), fanouts=(10, 25),
        layer0="full",
    )
    pubmed_l0 = _try_row(lambda: _measure(pubmed_graph, pubmed_model_full,
                         batch=1024, steps_per_block=200, blocks=2),
                         "pubmed_layer0_full")
    from graphsage_tpu.parallel.halo import build_node_partition

    _pubmed_l0_part = build_node_partition(pubmed_graph, 8,
                                           bounds="equal_nodes")
    if "error" not in pubmed_l0:
        pubmed_l0["edges_per_step"] = (
            pubmed_l0["edges_per_step"] + pubmed_graph.num_edges
        )
        pubmed_l0["edges_per_s"] = (
            pubmed_l0["edges_per_step"] / pubmed_l0["sec_per_step"]
        )

    # Cached layer-0 at the reference's own scale (preset
    # pubmed_layer0_cached): the 256K-row deepest-hop gather, its backward
    # scatter (the §5.1 floor) and the sampling hop all vanish; the 39 MB
    # cache gathers in the fast region. Measured round 5: 3.62 -> 0.38 ms
    # (9.4x), identical converged loss.
    def _pubmed_cached_row():
        from graphsage_tpu.data.graph import with_cached_layer0

        gc = with_cached_layer0(pubmed_graph)
        row = _measure(
            gc, _dc0.replace(pubmed_model_full, layer0="cached"),
            batch=1024, steps_per_block=200, blocks=2)
        if "error" not in pubmed:
            row["step_speedup_vs_exact"] = round(
                pubmed["sec_per_step"] / row["sec_per_step"], 3)
            row["exact_equivalent_edges_per_s"] = (
                pubmed["edges_per_step"] / row["sec_per_step"])
        return row

    pubmed_cached = _try_row(_pubmed_cached_row, "pubmed_layer0_cached")

    # LSTM aggregator on the Cora shape (the paper's third aggregator —
    # models/layers.masked_lstm): k sequential [B,H]x[H,4H] recurrent
    # matmuls per layer, input projection hoisted to one MXU pass. Adam —
    # the reference's SGD 0.7 diverges the recurrent gates.
    cora_lstm = _try_row(lambda: _measure(
        synthetic_cora_graph(2708, 1433, 5429, 7, seed=0),
        GraphSAGE(in_dim=1433, num_classes=7, hidden_dims=(128, 128),
                  fanouts=(10, 10), aggregator="lstm", pool_dim=128,
                  concat_self=True),
        batch=256, steps_per_block=200, blocks=2,
        optimizer="adam", learning_rate=0.005,
    ), "cora_lstm")

    import dataclasses as _dc

    _reddit_nopf = _dc.replace(reddit_model, project_first=False)

    # Learning floors (round-2 VERDICT item 8): a perf "win" that broke
    # convergence must not produce a green row. Envelopes are the round-3
    # measured final losses with generous headroom; chance = ln(C).
    # Round-3 measured final losses (TPU v5e, homophily-0.8 rows): cora
    # 1.7e-4, pubmed 7.1e-3, powerlaw-100k 9.5e-4, reddit 5.7e-4, 1M
    # 2.8e-3, fullbatch 5.9e-3, pubmed_l0 7.1e-3. Envelopes sit far above
    # measurement noise but far below chance (ln C), so any
    # convergence-breaking regression fails the bench.
    floors = {
        "cora": 0.05,                # ln(7)=1.95
        "pubmed_intent_fanout_10_25": 0.2,   # ln(3)=1.10
        "pubmed_shipped_fanout_10_10": 0.2,  # ln(3)=1.10
        "powerlaw_100k_nodes_1m_undirected_2m_slots": 0.5,  # ln(16)=2.77
        "reddit_232k_nodes_11m_slots_fanout_10_25": 0.5,    # ln(41)=3.71
        "powerlaw_1m_nodes_20m_slots_3layer": 0.8,          # ln(32)=3.47
        "powerlaw_1m_int8_table": 0.8,
        "powerlaw_1m_windowed_sampling": 0.8,
        "powerlaw_1m_layer0_cached": 0.8,
        "fullbatch_powerlaw_100k_2m_slots_2layer": 0.8,     # ln(16)=2.77
        "pubmed_layer0_full": 0.2,
        "pubmed_layer0_cached": 0.2,
        "cora_lstm": 0.5,            # ln(7)=1.95; CPU measured 1e-5 by
                                     # step 150 (adam lr 0.005)
        # Sharded trainers on the {data:1} mesh train the same math as the
        # plain cora step (round-3 measured final losses ~6.7e-4); a
        # convergence-breaking regression in the repo's most complex code
        # path must fail the bench (round-3 VERDICT item 5 / weak 5).
        "cora_sharded_feature_dense_1chip": 0.05,
        "cora_sharded_feature_compact_1chip": 0.05,
        "cora_fully_sharded_1chip": 0.05,
    }
    rows = {
        "cora": cora,
        "pubmed_intent_fanout_10_25": pubmed,
        "pubmed_shipped_fanout_10_10": pubmed_shipped,
        # 1M undirected input edges -> ~2M directed slots post-mirroring
        "powerlaw_100k_nodes_1m_undirected_2m_slots": powerlaw,
        "reddit_232k_nodes_11m_slots_fanout_10_25": reddit,
        "powerlaw_1m_nodes_20m_slots_3layer": powerlaw_1m,
        "powerlaw_1m_int8_table": powerlaw_1m_q,
        "powerlaw_1m_windowed_sampling": powerlaw_1m_w,
        "powerlaw_1m_layer0_cached": powerlaw_1m_c,
        "fullbatch_powerlaw_100k_2m_slots_2layer": fullbatch,
        "pubmed_layer0_full": pubmed_l0,
        "pubmed_layer0_cached": pubmed_cached,
        "cora_lstm": cora_lstm,
        "cora_sharded_feature_dense_1chip": sharded_rows["dense"],
        "cora_sharded_feature_compact_1chip": sharded_rows["compact"],
        "cora_fully_sharded_1chip": sharded_rows["fully"],
    }
    violations = []
    for name, floor in floors.items():
        fl = rows[name]["final_loss"]
        if not np.isfinite(fl) or fl > floor:
            violations.append({"config": name, "final_loss": fl,
                               "max_final_loss": floor})

    edges_per_s = cora["edges_per_s"]
    print(
        json.dumps(
            {
                "metric": "aggregation_throughput_cora_train_step",
                "value": round(edges_per_s, 1),
                "unit": "edges/s",
                "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 2),
                "detail": {
                    **{
                        name: {
                            k: (round(v, 8) if isinstance(v, (int, float))
                                else v)
                            for k, v in row.items()
                        }
                        for name, row in rows.items()
                    },
                    "sharded_comm_volume_s8_cora": comm_s8,
                    # Int8 wire effect (raw-row exchange, project_first off
                    # — with pf on, both ship d0-wide f32 rows and the int8
                    # saving lands on the local table read instead).
                    "sharded_comm_volume_s8_reddit_rawrows": {
                        "bf16": sharded_comm_stats(
                            _reddit_nopf, 512, 8, feature_dtype=jnp.bfloat16
                        )["gather_compact_bytes_per_chip_step"],
                        "int8": sharded_comm_stats(
                            _reddit_nopf, 512, 8, quantized=True
                        )["gather_compact_bytes_per_chip_step"],
                    },
                    # Flagship sharded-cached planning numbers: the cached
                    # layer 0 drops the deepest hop from the exchange too
                    # (the one gather site ships F-wide frozen-aggregate
                    # rows — no per-step table-build exchange at all).
                    "sharded_comm_volume_s8_powerlaw1m_cached": (
                        sharded_comm_stats(
                            _dc0.replace(model_1m, layer0="cached"),
                            4096, 8, fully_sharded=True,
                            feature_dtype=jnp.bfloat16,  # the 1M table/cache
                        )
                    ),
                    "serving_table_tier_pubmed": serving,
                    # layer0="full" sharded: d0-wide gather rows + the
                    # per-step table-build exchange (all_gather of the
                    # projected rows vs boundary-rows-only halo plan).
                    "sharded_comm_volume_s8_pubmed_layer0_full": (
                        sharded_comm_stats(
                            pubmed_model_full, 1024, 8, num_nodes=19717,
                            layer0_partition=_pubmed_l0_part,
                        )
                    ),
                    "learning_floor_violations": violations,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )
    if violations:
        import sys

        print(f"LEARNING FLOOR VIOLATED: {violations}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
