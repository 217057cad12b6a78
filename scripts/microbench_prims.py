"""Microbenchmarks for the rasterizer's HBM-bound glue primitives.

Methodology notes: each timed iteration gets a *distinct* input (cycled
from a pre-staged pool) — repeating one identical call under the axon
tunnel produced impossibly fast numbers (apparent result caching), so
never benchmark with constant inputs here.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 200_000          # gaussians
M = 1 << 21          # pairs (~2.1M)
T = 3600             # tiles
KMAX = 256
NVAR = 4             # distinct inputs cycled per benchmark


def timed(fn, variants, iters=8, warmup=2):
    f = jax.jit(fn)
    for i in range(warmup):
        out = f(*variants[i % NVAR])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(f(*variants[i % NVAR]))
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)

    def vars_of(make):
        return [make(k) for k in range(NVAR)]

    idxs = vars_of(lambda k: (
        jnp.asarray(rng.integers(0, N, M), jnp.int32),
        jnp.asarray(rng.random((M, 16)), jnp.float32)))
    print(f"scatter-add (m={M},16)->(n={N},16): "
          f"{timed(lambda i, v: jnp.zeros((N, 16), jnp.float32).at[i].add(v), idxs):.2f} ms",
          flush=True)

    keys = vars_of(lambda k: (
        jnp.asarray(rng.integers(0, 2**30, M), jnp.uint32),))
    print(f"sort u32 (m={M}):                   "
          f"{timed(lambda k: jax.lax.sort((k,), num_keys=1)[0], keys):.2f} ms",
          flush=True)

    payload = jnp.arange(M, dtype=jnp.int32)
    print(f"sort u32 + i32 payload:             "
          f"{timed(lambda k: jax.lax.sort((k, payload), num_keys=1), keys):.2f} ms",
          flush=True)

    halfm = M // 2
    keys_h = vars_of(lambda k: (
        jnp.asarray(rng.integers(0, 2**30, halfm), jnp.uint32),))
    print(f"sort u32 (m={halfm}):                  "
          f"{timed(lambda k: jax.lax.sort((k,), num_keys=1)[0], keys_h):.2f} ms",
          flush=True)

    rows = jnp.asarray(rng.random((N, 16)), jnp.float32)
    gidx = vars_of(lambda k: (
        jnp.asarray(rng.integers(0, N, M), jnp.int32),))
    print(f"row gather (m,16) from (n,16):      "
          f"{timed(lambda i: rows[i], gidx):.2f} ms", flush=True)

    vals = jnp.asarray(rng.random((M, 16)), jnp.float32)
    mono = vars_of(lambda k: (
        jnp.sort(jnp.asarray(rng.integers(0, M, T * KMAX), jnp.int32)),))
    print(f"monotone row gather (T*KMAX,16):    "
          f"{timed(lambda i: vals[i], mono):.2f} ms", flush=True)

    starts = vars_of(lambda k: (
        jnp.sort(jnp.asarray(rng.integers(0, M, T + 1), jnp.int32)),
        jnp.asarray(rng.integers(0, 2**30, M), jnp.uint32)))

    def window(st, vals_s):
        pad = jnp.concatenate([vals_s, jnp.zeros((KMAX,), vals_s.dtype)])
        slc = lambda s: jax.lax.dynamic_slice(pad, (s,), (KMAX,))
        return jax.vmap(slc)(st[:T])

    print(f"window gather (T,{KMAX}) of u32:      "
          f"{timed(window, starts):.2f} ms", flush=True)

    # scatter-add in bf16 values (half traffic)
    idxs16 = vars_of(lambda k: (
        jnp.asarray(rng.integers(0, N, M), jnp.int32),
        jnp.asarray(rng.random((M, 16)), jnp.bfloat16)))
    print(f"scatter-add bf16:                   "
          f"{timed(lambda i, v: jnp.zeros((N, 16), jnp.bfloat16).at[i].add(v), idxs16):.2f} ms",
          flush=True)

    # exact _unpack_grads shape: (T*KMAX) slots, <=9 dups per target
    rank_tbl = vars_of(lambda k: (
        jnp.asarray(rng.integers(0, N, (T, KMAX)), jnp.int32),
        jnp.asarray(rng.random((T, KMAX, 16)), jnp.float32),
        jnp.asarray(rng.permutation(N), jnp.int32)))

    def unpack(tbl, dtable, rank):
        flat = dtable.reshape(-1, 16)
        idx = jnp.minimum(tbl.reshape(-1), N - 1)
        d_rank = jnp.zeros((N, 16), jnp.float32).at[idx].add(flat)
        return d_rank[rank]

    print(f"unpack-grads exact (T*KMAX slots):  "
          f"{timed(unpack, rank_tbl):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
