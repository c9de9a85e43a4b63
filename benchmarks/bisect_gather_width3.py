"""Sweep part 3: locate the gather table-size cliff + the packed-int32 probe.

Part 2 found take from a [62.5K, 256] bf16 table (32 MB) runs at 3.83
ns/row while [250K, 256] (128 MB) runs at 12.33 — same 3.07M ids. This
locates the cliff (bytes vs rows) and re-runs the packed unpack probe that
part 2's crash skipped.

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/bisect_gather_width3.py
"""
import time
import numpy as np
import jax, jax.numpy as jnp

Q, K_FAN = 3_072_000, 5
K = 10
rng = np.random.default_rng(0)
ids_base = jnp.asarray(rng.integers(0, 1 << 30, Q), jnp.int32)

def timed(name, make_fn, *args):
    try:
        fn = jax.jit(make_fn)
        r = fn(*args); np.asarray(jax.device_get(r))
        t0 = time.perf_counter()
        r = fn(*args); np.asarray(jax.device_get(r))
        dt = (time.perf_counter() - t0 - 0.028) / K
        print(f"{name}: {dt*1e3:.2f} ms  ({dt/Q*1e9:.2f} ns/row)", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

def scan_block(body):
    def run(c, *args):
        def b(acc, i):
            return body(acc, i, *args), None
        return jax.lax.scan(b, c, jnp.arange(K))[0]
    return run

def _p(idx, acc):
    return idx + (acc * 1e-20).astype(jnp.int32)

c0 = jnp.zeros((), jnp.float32)

def probe_take(name, rows, width, dtype=jnp.bfloat16):
    tbl = jnp.asarray(rng.normal(size=(rows, width)), dtype)
    ids = ids_base % rows
    mb = rows * width * tbl.dtype.itemsize / 1e6
    timed(f"{name} [{rows}x{width}] {dtype.__name__} ({mb:.0f} MB)",
          scan_block(
              lambda acc, i, t, idx: acc + jnp.take(
                  t, _p(idx, acc), axis=0
              ).astype(jnp.float32).sum() * 1e-12),
          c0, tbl, ids)

probe_take("take", 62_500, 256)      # 32 MB  (3.8 ns in part 2)
probe_take("take", 100_000, 256)     # 51 MB
probe_take("take", 125_000, 256)     # 64 MB
probe_take("take", 150_000, 256)     # 77 MB
probe_take("take", 200_000, 256)     # 102 MB
probe_take("take", 62_500, 1024)     # 128 MB, few rows — bytes or rows?
probe_take("take", 500_000, 128)     # 128 MB, many rows
probe_take("take", 1_000_000, 32)    # 64 MB, 1M rows
probe_take("take", 125_000, 256, jnp.float32)  # 128 MB f32, 125K rows

# Packed int32-view gather + fused bf16-pair unpack + masked mean.
N = 1_000_000
base_bf16 = jnp.asarray(rng.normal(size=(N, 256)), jnp.bfloat16)
t_packed = jax.lax.bitcast_convert_type(
    base_bf16.reshape(N, 128, 2), jnp.int32
)
ids2d = (ids_base % N).reshape(-1, K_FAN)
mask2d = jnp.ones(ids2d.shape, bool)

def packed_mean(acc, i, t, idx, m):
    rows = jnp.take(t, _p(idx, acc).reshape(-1), axis=0)   # [Q,128] int32
    lo = jax.lax.bitcast_convert_type(rows << 16, jnp.float32)
    hi = jax.lax.bitcast_convert_type(rows & jnp.int32(-65536), jnp.float32)
    lo = lo.reshape(-1, K_FAN, 128)
    hi = hi.reshape(-1, K_FAN, 128)
    mm = m.astype(jnp.float32)[..., None]
    cnt = jnp.maximum(mm.sum(axis=1), 1.0)
    mean_lo = (lo * mm).sum(axis=1) / cnt                  # [B,128]
    mean_hi = (hi * mm).sum(axis=1) / cnt
    out = jnp.stack([mean_lo, mean_hi], axis=-1).reshape(-1, 256)
    return acc + out.sum() * 1e-12

timed("packed int32 gather + fused unpack + mean [1Mx128 i32]",
      scan_block(packed_mean), c0, t_packed, ids2d, mask2d)

rows = jnp.take(t_packed, ids2d[:64].reshape(-1), axis=0)
lo = jax.lax.bitcast_convert_type(rows << 16, jnp.float32)
hi = jax.lax.bitcast_convert_type(rows & jnp.int32(-65536), jnp.float32)
got = jnp.stack([lo, hi], axis=-1).reshape(-1, 256)
want = jnp.take(base_bf16, ids2d[:64].reshape(-1), axis=0).astype(jnp.float32)
print("packed unpack exact:", bool(jnp.all(got == want)), flush=True)
