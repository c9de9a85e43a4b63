"""Gather cost model probe: is XLA's TPU row gather priced per LANE-TILE?

bisect_1m_forward.py measured 12.4 ns/row for [1M, 256] bf16 takes (two
128-lane tiles per row) while the sampler's [312K, 128] int32 lane fetches
run ~6 ns — suggesting per-row cost = ~6 ns x ceil(row_lanes / 128),
independent of bytes. If true, bitcasting a bf16 [N, 256] table to int32
[N, 128] (same 512 B rows, ONE lane-tile) should halve the deepest-hop
gather; int8 [N, 256] -> int32 [N, 64] likewise.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/bisect_gather_width.py
"""
import time
import numpy as np
import jax, jax.numpy as jnp

N, Q = 1_000_000, 3_072_000
K = 10
rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, N, Q), jnp.int32)
base_bf16 = jnp.asarray(rng.normal(size=(N, 256)), jnp.bfloat16)

def timed(name, make_fn, *args):
    try:
        fn = jax.jit(make_fn)
        r = fn(*args); np.asarray(jax.device_get(r))
        t0 = time.perf_counter()
        r = fn(*args); np.asarray(jax.device_get(r))
        dt = (time.perf_counter() - t0 - 0.028) / K
        per_row = dt / Q * 1e9
        print(f"{name}: {dt*1e3:.2f} ms  ({per_row:.2f} ns/row)", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

def scan_block(body):
    def run(c, *args):
        def b(acc, i):
            return body(acc, i, *args), None
        return jax.lax.scan(b, c, jnp.arange(K))[0]
    return run

def _p(ids, acc):
    return ids + (acc * 1e-20).astype(jnp.int32)

c0 = jnp.zeros((), jnp.float32)

def probe(name, table):
    timed(name, scan_block(
        lambda acc, i, t, idx: acc + jnp.take(
            t, _p(idx, acc), axis=0
        ).astype(jnp.float32).sum() * 1e-12),
        c0, table, ids)

probe("bf16 [1M,256]  (512B, 2 lane-tiles)", base_bf16)
probe("int32 view [1M,128] (512B, 1 tile)",
      jax.lax.bitcast_convert_type(base_bf16.reshape(N, 128, 2), jnp.int32))
probe("f32 [1M,256]  (1KB, 2 tiles)", base_bf16.astype(jnp.float32))
probe("f32 [1M,128]  (512B, 1 tile)",
      base_bf16[:, :128].astype(jnp.float32))
probe("bf16 [1M,128]  (256B, 1 tile)", base_bf16[:, :128])
probe("bf16 [1M,512]  (1KB, 4 tiles)",
      jnp.concatenate([base_bf16, base_bf16], axis=1))
probe("int8 [1M,256]  (256B, 2 tiles)",
      (base_bf16 * 8).astype(jnp.int8))
probe("int8 as int32 [1M,64] (256B, 1 tile)",
      jax.lax.bitcast_convert_type(
          (base_bf16 * 8).astype(jnp.int8).reshape(N, 64, 4), jnp.int32))

# bitcast round-trip correctness + cost: gather int32 view then bitcast back
def roundtrip(acc, i, t, idx):
    rows = jnp.take(t, _p(idx, acc), axis=0)           # [Q, 128] int32
    back = jax.lax.bitcast_convert_type(rows, jnp.bfloat16).reshape(-1, 256)
    return acc + back.astype(jnp.float32).sum() * 1e-12
timed("int32-view gather + bitcast back to bf16", scan_block(roundtrip),
      c0, jax.lax.bitcast_convert_type(base_bf16.reshape(N, 128, 2), jnp.int32),
      ids)

# sanity: the two forms agree numerically
t32 = jax.lax.bitcast_convert_type(base_bf16.reshape(N, 128, 2), jnp.int32)
a = jnp.take(base_bf16, ids[:1024], axis=0)
b = jax.lax.bitcast_convert_type(
    jnp.take(t32, ids[:1024], axis=0), jnp.bfloat16
).reshape(-1, 256)
print("bitcast roundtrip exact:", bool(jnp.all(a == b)), flush=True)
