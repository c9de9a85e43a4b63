"""Sweep part 2: Pallas-DMA impl at the 1M shape, table-size effect, and
the packed-int32 gather + in-register bf16 unpack (shift+bitcast) fusion.

bisect_gather_width.py established: XLA's row gather is overhead-bound at
~10.4 ns/row (1 lane-tile) + ~1.4 ns per extra tile, dtype-independent,
locality-independent. The open questions:
  * does the double-buffered Pallas DMA kernel (ops/pallas_gather.py) beat
    that at the 1M shape (it lost at Pubmed shapes)?
  * does table ROW COUNT matter (the sampler's [312K, 128] fetches looked
    cheaper per row)?
  * can the 1-tile int32-view gather feed the masked mean WITHOUT the
    +5 ms bitcast relayout — unpacking bf16 pairs as f32 via mask/shift +
    bitcast (bf16 is truncated f32, so value-exact)?

Run: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/bisect_gather_width2.py
"""
import time
import numpy as np
import jax, jax.numpy as jnp

N, Q, K_FAN = 1_000_000, 3_072_000, 5
K = 10
rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, N, Q), jnp.int32)
ids2d = ids.reshape(-1, K_FAN)
mask2d = jnp.ones(ids2d.shape, bool)
base_bf16 = jnp.asarray(rng.normal(size=(N, 256)), jnp.bfloat16)

def timed(name, make_fn, *args):
    try:
        fn = jax.jit(make_fn)
        r = fn(*args); np.asarray(jax.device_get(r))
        t0 = time.perf_counter()
        r = fn(*args); np.asarray(jax.device_get(r))
        dt = (time.perf_counter() - t0 - 0.028) / K
        print(f"{name}: {dt*1e3:.2f} ms  ({dt/Q*1e9:.2f} ns/row)", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

def scan_block(body):
    def run(c, *args):
        def b(acc, i):
            return body(acc, i, *args), None
        return jax.lax.scan(b, c, jnp.arange(K))[0]
    return run

def _p(idx, acc):
    return idx + (acc * 1e-20).astype(jnp.int32)

c0 = jnp.zeros((), jnp.float32)

# 1. Pallas DMA gather_mean at this shape (lost at Pubmed scale; re-check).
from graphsage_tpu.ops.aggregate import gather_mean
timed("gather_mean dma (pallas, 8-row aligned copies)", scan_block(
    lambda acc, i, t, idx, m: acc + gather_mean(
        t, _p(idx, acc), m, impl="dma", bf16=True
    ).sum() * 1e-12),
    c0, base_bf16, ids2d, mask2d)

# 2. Table-size effect: same Q, smaller tables.
for rows in (62_500, 250_000):
    tbl = base_bf16[:rows]
    ids_small = ids % rows
    timed(f"take bf16 [{rows},256], same 3.07M ids", scan_block(
        lambda acc, i, t, idx: acc + jnp.take(
            t, _p(idx, acc), axis=0
        ).astype(jnp.float32).sum() * 1e-12),
        c0, tbl, ids_small)

# 3. Sampler-shaped fetch: [312500, 128] int32 rows, 3.07M ids.
tbl_i32 = jax.lax.bitcast_convert_type(
    base_bf16[:312_500 * 2].reshape(312_500, 128, 4), jnp.int32
).reshape(312_500, 512)[:, :128]
timed("take int32 [312.5K,128] (sampler's fetch shape)", scan_block(
    lambda acc, i, t, idx: acc + jnp.take(
        t, _p(idx, acc) % 312_500, axis=0
    ).astype(jnp.float32).sum() * 1e-12),
    c0, tbl_i32, ids)

# 4. Packed gather_mean: gather [Q,128] int32 (1 tile), unpack bf16 pairs
#    as f32 via mask/shift + bitcast (elementwise — should fuse into the
#    gather's consumer), masked-mean at [B,128] f32 x2, interleave at B.
t_packed = jax.lax.bitcast_convert_type(
    base_bf16.reshape(N, 128, 2), jnp.int32
)

def packed_mean(acc, i, t, idx, m):
    rows = jnp.take(t, _p(idx, acc).reshape(-1), axis=0)   # [Q,128] int32
    lo = jax.lax.bitcast_convert_type(rows << 16, jnp.float32)
    hi = jax.lax.bitcast_convert_type(
        rows & jnp.int32(-65536), jnp.float32
    )
    lo = lo.reshape(-1, K_FAN, 128)
    hi = hi.reshape(-1, K_FAN, 128)
    mm = m.astype(jnp.float32)[..., None]
    cnt = jnp.maximum(mm.sum(axis=1), 1.0)
    mean_lo = (lo * mm).sum(axis=1) / cnt                  # [B,128]
    mean_hi = (hi * mm).sum(axis=1) / cnt
    out = jnp.stack([mean_lo, mean_hi], axis=-1).reshape(-1, 256)
    return acc + out.sum() * 1e-12

timed("packed int32 gather + fused bf16-pair unpack + mean",
      scan_block(packed_mean), c0, t_packed, ids2d, mask2d)

# correctness of the packed form
rows = jnp.take(t_packed, ids2d[:64].reshape(-1), axis=0)
lo = jax.lax.bitcast_convert_type(rows << 16, jnp.float32)
hi = jax.lax.bitcast_convert_type(rows & jnp.int32(-65536), jnp.float32)
got = jnp.stack([lo, hi], axis=-1).reshape(-1, 256)
want = jnp.take(base_bf16, ids2d[:64].reshape(-1), axis=0).astype(jnp.float32)
print("packed unpack exact:", bool(jnp.all(got == want)), flush=True)

# 5. For scale: the plain bf16 gather_mean unrolled reference point again.
timed("gather_mean unrolled bf16 (reference 38.4ms)", scan_block(
    lambda acc, i, t, idx, m: acc + gather_mean(
        t, _p(idx, acc), m, impl="unrolled", bf16=True
    ).sum() * 1e-12),
    c0, base_bf16, ids2d, mask2d)
