"""Characterize the TPU row-gather/scatter floor that bounds the raster
pack/unpack bookends (VERDICT r4 item 1).

The round-4 measurement (masked_row_cost.py) showed XLA row-indexed ops
cost ~20 ns/row *address-independent* at 64 B rows. The design question
for an in-kernel replacement is whether that floor is per-ROW (then
regrouping 8 gaussians per 512 B row is an 8x lever and VMEM-resident
Pallas gathers may beat it) or per-BYTE (then only bf16 halving helps).

Measures, pipelined over the axon tunnel (see memory: ~30 ms/dispatch):
  g16    gather (R,) rows from (N,16) f32      -- the shipping pack
  g16b   gather bf16                            -- byte dependence
  g128   gather (R/8,) rows from (N/8,128) f32 -- same bytes, 1/8 rows
  g8     gather (R,) rows from (N,8) f32       -- half bytes, same rows
  s16    scatter-add (R,16) -> (N,16)          -- the shipping unpack
  s128   scatter-add (R/8,128) -> (N/8,128)    -- same bytes, 1/8 rows
  pallas_vmem_loop  per-row dynamic reads from a VMEM-resident
         (N/8,128) table inside a Pallas kernel (fori_loop), emitting
         packed (K,128) blocks -- the candidate in-kernel gather.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 200_000
R = 460_800          # 3600 tiles x 128 slots


def timeit(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    _ = np.asarray(jnp.ones(8) + 1)    # tunnel sync point
    rng = np.random.default_rng(0)

    a16 = jnp.asarray(rng.random((N, 16)), jnp.float32)
    a16b = a16.astype(jnp.bfloat16)
    a8 = a16[:, :8]
    a128 = a16.reshape(N // 8, 128)
    idx = jnp.asarray(rng.integers(0, N, R), jnp.int32)
    idx8 = jnp.asarray(rng.integers(0, N // 8, R // 8), jnp.int32)
    v16 = jnp.asarray(rng.random((R, 16)), jnp.float32)
    v128 = v16.reshape(R // 8, 128)

    g = jax.jit(lambda a, i: a[i])
    s = lambda n: jax.jit(lambda v, i: jnp.zeros((n, v.shape[1]), v.dtype)
                          .at[i].add(v))

    res = {}
    res["g16_ms"] = timeit(g, a16, idx)
    res["g16b_ms"] = timeit(g, a16b, idx)
    res["g8_ms"] = timeit(g, a8, idx)
    res["g128_ms"] = timeit(g, a128, idx8)
    res["s16_ms"] = timeit(s(N), v16, idx)
    res["s128_ms"] = timeit(s(N // 8), v128, idx8)

    # --- Pallas: VMEM-resident table, per-row dynamic reads -------------
    # Table (N/8, 128) f32 = 12.8 MB in VMEM; grid over index blocks of
    # K rows; each step reads K rows by dynamic sublane index and writes
    # a packed (K, 128) block.
    K = 512

    def kern(idx_ref, tbl_ref, out_ref):
        def body(k, _):
            out_ref[k, :] = tbl_ref[idx_ref[k], :]
            return 0
        jax.lax.fori_loop(0, K, body, 0)

    @jax.jit
    def pallas_gather(tbl, idx8):
        return pl.pallas_call(
            kern,
            grid=(R // 8 // K,),
            in_specs=[
                pl.BlockSpec((K,), lambda t: (t,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((N // 8, 128), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((K, 128), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R // 8, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(idx8, tbl)

    try:
        out = pallas_gather(a128, idx8)
        ok = bool(jnp.allclose(out, a128[idx8]))
        res["pallas_vmem_loop_ms"] = timeit(pallas_gather, a128, idx8)
        res["pallas_vmem_loop_ok"] = ok
    except Exception as e:  # noqa: BLE001
        res["pallas_vmem_loop_err"] = str(e)[:300]

    for k, v in res.items():
        if isinstance(v, float):
            rows = R // 8 if ("128" in k or "pallas" in k) else R
            print(f"{k:24s} {v:8.2f} ms   {v * 1e6 / rows:7.1f} ns/row")
        else:
            print(f"{k:24s} {v}")


if __name__ == "__main__":
    main()
