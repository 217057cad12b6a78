"""Microbenchmarks for the rasterizer's HBM-bound glue primitives.

Times, on the real chip, the candidate implementations for table
pack/unpack so the binning/backward design follows measured costs:
  - scatter-add (m,16) rows -> (n,16)             [current _unpack_grads]
  - u32 sort of m keys                            [current binning sort]
  - u32 sort with i32 payload                     [rank-major resort]
  - random row gather (m,16) from (n,16)          [current _pack_table core]
  - windowed contiguous gather                    [current rank_tbl build]
  - searchsorted n into m
  - set-scatter of i32 (permutation inverse)
  - argsort-of-argsort permutation inverse
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 200_000          # gaussians
M = 1 << 21          # pairs (~2.1M)
T = 3600             # tiles
KMAX = 256


def timed(fn, *args, iters=10, warmup=2):
    f = jax.jit(fn)
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, M), jnp.int32)
    vals = jnp.asarray(rng.random((M, 16)), jnp.float32)
    keys = jnp.asarray(rng.integers(0, 2**30, M), jnp.uint32)
    payload = jnp.arange(M, dtype=jnp.int32)
    rows = jnp.asarray(rng.random((N, 16)), jnp.float32)
    starts = jnp.sort(jnp.asarray(rng.integers(0, M, T + 1), jnp.int32))

    print(f"scatter-add (m={M},16)->(n={N},16): "
          f"{timed(lambda i, v: jnp.zeros((N, 16), jnp.float32).at[i].add(v), idx, vals):.2f} ms")
    print(f"segment_sum sorted ids:             "
          f"{timed(lambda i, v: jax.ops.segment_sum(v, jnp.sort(i), num_segments=N), idx, vals):.2f} ms")
    print(f"sort u32 (m,):                      "
          f"{timed(lambda k: jax.lax.sort((k,), num_keys=1)[0], keys):.2f} ms")
    print(f"sort u32+i32 payload:               "
          f"{timed(lambda k, p: jax.lax.sort((k, p), num_keys=1), keys, payload):.2f} ms")
    print(f"argsort-invert (2nd sort):          "
          f"{timed(lambda p: jax.lax.sort((p, payload), num_keys=1), payload[::-1]):.2f} ms")
    print(f"set-scatter i32 (m,):               "
          f"{timed(lambda p: jnp.zeros((M,), jnp.int32).at[p].set(payload), payload[::-1]):.2f} ms")
    print(f"row gather (m,16) from (n,16):      "
          f"{timed(lambda i: rows[i], idx):.2f} ms")
    print(f"row gather (m,) i32 from (n,):      "
          f"{timed(lambda i: rows[:, 0][i], idx):.2f} ms")

    def window(vals_s, st):
        pad = jnp.concatenate([vals_s, jnp.zeros((KMAX,), vals_s.dtype)])
        slc = lambda s: jax.lax.dynamic_slice(pad, (s,), (KMAX,))
        return jax.vmap(slc)(st[:T])

    print(f"window gather (T,{KMAX}) of i32:      "
          f"{timed(window, keys, starts):.2f} ms")
    print(f"searchsorted (n into m):            "
          f"{timed(lambda k: jnp.searchsorted(k, jnp.arange(0, 2**30, 2**30 // N, dtype=jnp.uint32)), jnp.sort(keys)):.2f} ms")
    # windowed row gather: (T*KMAX) rows of 16 from (m,16), monotone idx
    mono = jnp.sort(jnp.asarray(rng.integers(0, M, T * KMAX), jnp.int32))
    print(f"monotone row gather (T*KMAX,16):    "
          f"{timed(lambda i: vals[i], mono):.2f} ms")
    # bf16 variants
    vals16 = vals.astype(jnp.bfloat16)
    print(f"scatter-add bf16:                   "
          f"{timed(lambda i, v: jnp.zeros((N, 16), jnp.bfloat16).at[i].add(v), idx, vals16):.2f} ms")
    print(f"row gather bf16 (m,16):             "
          f"{timed(lambda i: rows.astype(jnp.bfloat16)[i], idx):.2f} ms")


if __name__ == "__main__":
    main()
