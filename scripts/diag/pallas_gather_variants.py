"""Find a compiling+fast Pallas in-kernel row-gather formulation.

Variants over a VMEM-resident (N/8, 128) f32 table (12.8 MB):
  A  fori_loop, direct int indexing            tbl_ref[i, :]
  B  fori_loop, pl.ds indexing                 tbl_ref[pl.ds(i, 1), :]
  C  unrolled python loop (K small)
  D  per-row DMA HBM->VMEM (descriptor-rate probe), double-buffered
Each writes packed (K, 128) blocks; grid over R/8/K index blocks.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N8 = 25_000
R8 = 57_600
CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def variant_a(K):
    def kern(idx_ref, tbl_ref, out_ref):
        def body(k, _):
            out_ref[k, :] = tbl_ref[idx_ref[k // K, k % K], :]
            return 0
        jax.lax.fori_loop(0, 8 * K, body, 0)

    @jax.jit
    def run(tbl, idx):
        return pl.pallas_call(
            kern, grid=(R8 // K,),
            in_specs=[pl.BlockSpec((8, K), lambda t: (t, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((N8, 128), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8 * K, 128), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R8, 128), jnp.float32),
            compiler_params=CP)(idx, tbl)
    return run


def variant_b(K):
    def kern(idx_ref, tbl_ref, out_ref):
        def body(k, _):
            i = idx_ref[k // K, k % K]
            out_ref[pl.ds(k, 1), :] = tbl_ref[pl.ds(i, 1), :]
            return 0
        jax.lax.fori_loop(0, 8 * K, body, 0)

    @jax.jit
    def run(tbl, idx):
        return pl.pallas_call(
            kern, grid=(R8 // (8 * K),),
            in_specs=[pl.BlockSpec((8, K), lambda t: (t, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((N8, 128), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8 * K, 128), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R8, 128), jnp.float32),
            compiler_params=CP)(idx, tbl)
    return run


def variant_c(K):
    def kern(idx_ref, tbl_ref, out_ref):
        for k in range(K):
            out_ref[k, :] = tbl_ref[idx_ref[0, k], :]

    @jax.jit
    def run(tbl, idx):
        return pl.pallas_call(
            kern, grid=(R8 // K,),
            in_specs=[pl.BlockSpec((8, K), lambda t: (t, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((N8, 128), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8 * K, 128), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R8, 128), jnp.float32),
            compiler_params=CP)(idx, tbl)
    return run


def variant_d(K):
    """HBM-resident table; per-row DMAs, 8-deep ring."""
    NSEM = 8

    def kern(idx_ref, tbl_ref, out_ref, sem):
        def start(k):
            pltpu.make_async_copy(
                tbl_ref.at[pl.ds(idx_ref[k // K, k % K], 1), :],
                out_ref.at[pl.ds(k, 1), :],
                sem.at[k % NSEM]).start()

        for k in range(min(NSEM, K)):
            start(k)

        def body(k, _):
            pltpu.make_async_copy(
                tbl_ref.at[pl.ds(idx_ref[k // K, k % K], 1), :],
                out_ref.at[pl.ds(k, 1), :],
                sem.at[k % NSEM]).wait()

            @pl.when(k + NSEM < K)
            def _():
                start_k = k + NSEM
                pltpu.make_async_copy(
                    tbl_ref.at[pl.ds(idx_ref[start_k // K, start_k % K], 1), :],
                    out_ref.at[pl.ds(start_k, 1), :],
                    sem.at[start_k % NSEM]).start()
            return 0
        jax.lax.fori_loop(0, 8 * K, body, 0)

    @jax.jit
    def run(tbl, idx):
        return pl.pallas_call(
            kern, grid=(R8 // (8 * K),),
            in_specs=[pl.BlockSpec((8, K), lambda t: (t, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((8 * K, 128), lambda t: (t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R8, 128), jnp.float32),
            scratch_shapes=[pltpu.SemaphoreType.DMA((NSEM,))],
            compiler_params=CP)(idx, tbl)
    return run


def main():
    _ = np.asarray(jnp.ones(8) + 1)
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.random((N8, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N8, R8), jnp.int32)
    ref = tbl[idx]

    for name, make, K in [("A_fori_direct", variant_a, 480),
                          ("B_fori_ds", variant_b, 480),
                          ("C_unroll60", variant_c, 60),
                          ("D_dma_ring", variant_d, 480)]:
        try:
            run = make(K)
            out = run(tbl, idx.reshape(-1, K))
            ok = bool(jnp.allclose(out, ref))
            ms = timeit(run, tbl, idx.reshape(-1, K))
            print(f"{name:16s} {ms:8.2f} ms  {ms * 1e6 / R8:7.1f} ns/row"
                  f"  ok={ok}")
        except Exception as e:  # noqa: BLE001
            print(f"{name:16s} FAIL {str(e)[:200]}")


if __name__ == "__main__":
    main()
