"""Sorted vs random vs int8 row gather from a large table (the 1M-config floor).

Round-2 recorded ~24 ns/row gathering from the 512 MB table and called it
HBM-*locality*-bound; this microbench re-measures with a hoist-proof body
(the gather ids depend on the scan carry, so XLA cannot CSE the gather out
of the loop) and adds an int8 leg (table + per-row scales, the
``quantize_graph`` layout) to decide whether the floor is locality- or
bandwidth-bound: if int8 halves the time vs bf16, bytes dominate.

Run on the real chip (from the repo root):
    python benchmarks/microbench_gather.py
"""
import time
import numpy as np
import jax, jax.numpy as jnp

N, F = 1_000_000, 256
Q = 3_072_000
rng = np.random.default_rng(0)
table_f32 = rng.normal(size=(N, F)).astype(np.float32)
table = jnp.asarray(table_f32).astype(jnp.bfloat16)
scales = jnp.asarray(np.abs(table_f32).max(axis=1) / 127.0)
table_i8 = jnp.asarray(
    np.clip(np.rint(table_f32 / np.asarray(scales)[:, None]), -127, 127)
).astype(jnp.int8)
ids = jnp.asarray(np.random.default_rng(1).integers(0, N, Q).astype(np.int32))

def consume(x):
    x = x.astype(jnp.float32)
    return (x * x).sum()

def dep_ids(ids, acc):
    # carry-dependent zero offset: forces the gather INSIDE the loop
    return ids + jnp.int32(acc * 1e-30)

@jax.jit
def g_random(table, ids, c):
    def body(acc, _):
        rows = jnp.take(table, dep_ids(ids, acc), axis=0)
        return acc + consume(rows) * (1 + acc * 1e-20), None
    return jax.lax.scan(body, c, None, length=5)[0]

@jax.jit
def g_int8(table_i8, scales, ids, c):
    def body(acc, _):
        i = dep_ids(ids, acc)
        rows = jnp.take(table_i8, i, axis=0).astype(jnp.bfloat16)
        s = jnp.take(scales, i)
        return acc + consume(rows * s[:, None].astype(jnp.bfloat16)) * (
            1 + acc * 1e-20
        ), None
    return jax.lax.scan(body, c, None, length=5)[0]

@jax.jit
def g_sort_then_gather(table, ids, c):
    # full pipeline: argsort + gather + inverse permutation of rows
    def body(acc, _):
        order = jnp.argsort(dep_ids(ids, acc))
        rows = jnp.take(table, ids[order], axis=0)
        rows = jnp.take(rows, jnp.argsort(order), axis=0)
        return acc + consume(rows) * (1 + acc * 1e-20), None
    return jax.lax.scan(body, c, None, length=5)[0]

sids = jnp.sort(ids)
runs = (
    ("random_bf16", lambda c: g_random(table, ids, c)),
    ("sorted_ids_bf16", lambda c: g_random(table, sids, c)),
    ("random_int8+dequant", lambda c: g_int8(table_i8, scales, ids, c)),
    ("sort+gather+unperm", lambda c: g_sort_then_gather(table, ids, c)),
)
for name, fn in runs:
    r = fn(jnp.zeros((), jnp.float32)); np.asarray(r)  # compile
    t0 = time.perf_counter()
    r = fn(jnp.ones((), jnp.float32)); np.asarray(r)
    dt = (time.perf_counter() - t0 - 0.028) / 5
    print(f"{name}: {dt*1e3:.2f} ms/gather  ({dt/Q*1e9:.2f} ns/row)", flush=True)
