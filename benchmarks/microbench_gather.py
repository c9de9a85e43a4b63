"""Sorted vs random row gather from a large table (the 1M-config floor).

Round-2 floor: ~24 ns/row gathering from a 512 MB table vs ~5 ns/row from
small tables — an HBM-locality effect. If sorting the 3M deepest-hop ids
(cost: one argsort) recovers locality, a sort-gather-unpermute wrapper wins.

Run on the real chip: PYTHONPATH=/root/.axon_site:/root/repo \
    python benchmarks/microbench_gather.py
"""
import time
import numpy as np
import jax, jax.numpy as jnp

N, F = 1_000_000, 256
Q = 3_072_000
table = jnp.asarray(np.random.default_rng(0).normal(size=(N, F)).astype(np.float32)).astype(jnp.bfloat16)
ids = jnp.asarray(np.random.default_rng(1).integers(0, N, Q).astype(np.int32))

def consume(x):
    return (x.astype(jnp.float32) * x.astype(jnp.float32)).sum()

@jax.jit
def g_random(table, ids, c):
    def body(acc, _):
        rows = jnp.take(table, ids, axis=0)
        return acc + consume(rows) * (1 + acc * 1e-20), None
    return jax.lax.scan(body, c, None, length=5)[0]

@jax.jit
def g_sorted_ids(table, sids, c):
    def body(acc, _):
        rows = jnp.take(table, sids, axis=0)
        return acc + consume(rows) * (1 + acc * 1e-20), None
    return jax.lax.scan(body, c, None, length=5)[0]

@jax.jit
def g_sort_then_gather(table, ids, c):
    # full pipeline: argsort + gather + inverse permutation of rows
    def body(acc, _):
        order = jnp.argsort(ids)
        rows = jnp.take(table, ids[order], axis=0)
        rows = jnp.take(rows, jnp.argsort(order), axis=0)
        return acc + consume(rows) * (1 + acc * 1e-20), None
    return jax.lax.scan(body, c, None, length=5)[0]

sids = jnp.sort(ids)
for name, fn, a in (("random", g_random, ids), ("sorted_ids", g_sorted_ids, sids),
                    ("sort+gather+unperm", g_sort_then_gather, ids)):
    r = fn(table, a, jnp.zeros((), jnp.float32)); np.asarray(r)  # compile
    t0 = time.perf_counter()
    r = fn(table, a, jnp.ones((), jnp.float32)); np.asarray(r)
    dt = (time.perf_counter() - t0 - 0.028) / 5
    print(f"{name}: {dt*1e3:.2f} ms/gather  ({dt/Q*1e9:.2f} ns/row)", flush=True)
