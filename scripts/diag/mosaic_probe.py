"""Isolate which Pallas construct crashes the Mosaic compile helper.

Runs one numbered probe kernel (sys.argv[1]); the driver shell runs each
in a fresh process and waits out the ~1 min claim wedge after a crash.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def probe1():
    """2D int32 SMEM blocked input, no dynamic indexing."""
    def kern(idx_ref, out_ref):
        out_ref[:] = jnp.full((8, 128), idx_ref[0, 0], jnp.int32)

    idx = jnp.zeros((16, 8), jnp.int32)
    out = pl.pallas_call(
        kern, grid=(2,),
        in_specs=[pl.BlockSpec((8, 8), lambda t: (t, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.int32),
        compiler_params=CP)(idx)
    return out


def probe2():
    """Single dynamic sublane read from a big VMEM table by SMEM scalar."""
    def kern(idx_ref, tbl_ref, out_ref):
        out_ref[0, :] = tbl_ref[idx_ref[0, 0], :]

    tbl = jnp.ones((25_000, 128), jnp.float32)
    idx = jnp.full((1, 1), 17, jnp.int32)
    out = pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((1, 1), lambda t: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((25_000, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=CP)(idx, tbl)
    return out


def probe3():
    """fori_loop with dynamic STORE row index (static table read)."""
    def kern(tbl_ref, out_ref):
        def body(k, _):
            out_ref[k, :] = tbl_ref[k, :] + 1.0
            return 0
        jax.lax.fori_loop(0, 8, body, 0)

    tbl = jnp.ones((8, 128), jnp.float32)
    out = pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((8, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=CP)(tbl)
    return out


def probe4():
    """fori_loop, dynamic read row from mid-size VMEM table via SMEM idx."""
    def kern(idx_ref, tbl_ref, out_ref):
        def body(k, _):
            out_ref[k, :] = tbl_ref[idx_ref[0, k], :]
            return 0
        jax.lax.fori_loop(0, 64, body, 0)

    tbl = jnp.ones((1024, 128), jnp.float32)
    idx = jnp.zeros((1, 64), jnp.int32)
    out = pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((1, 64), lambda t: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1024, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        compiler_params=CP)(idx, tbl)
    return out


def probe5():
    """probe4 but table 25k rows (12.8 MB VMEM)."""
    def kern(idx_ref, tbl_ref, out_ref):
        def body(k, _):
            out_ref[k, :] = tbl_ref[idx_ref[0, k], :]
            return 0
        jax.lax.fori_loop(0, 64, body, 0)

    tbl = jnp.ones((25_000, 128), jnp.float32)
    idx = jnp.zeros((1, 64), jnp.int32)
    out = pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((1, 64), lambda t: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((25_000, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        compiler_params=CP)(idx, tbl)
    return out


def probe6():
    """Per-row DMA HBM->VMEM by dynamic index, one DMA, no loop."""
    def kern(idx_ref, tbl_ref, out_ref, sem):
        cp = pltpu.make_async_copy(
            tbl_ref.at[pl.ds(idx_ref[0, 0], 8), :],
            out_ref.at[pl.ds(0, 8), :], sem)
        cp.start()
        cp.wait()

    tbl = jnp.ones((25_000, 128), jnp.float32)
    idx = jnp.full((1, 1), 40, jnp.int32)
    out = pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((1, 1), lambda t: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((8, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=CP)(idx, tbl)
    return out


def probe7():
    """Dynamic-store accumulate: out[idx] += val (RMW on VMEM)."""
    def kern(idx_ref, val_ref, out_ref):
        out_ref[:] = jnp.zeros_like(out_ref)

        def body(k, _):
            i = idx_ref[0, k]
            out_ref[i, :] = out_ref[i, :] + val_ref[k, :]
            return 0
        jax.lax.fori_loop(0, 64, body, 0)

    idx = jnp.asarray(np.random.default_rng(0).integers(0, 512, (1, 64)),
                      jnp.int32)
    val = jnp.ones((64, 128), jnp.float32)
    out = pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((1, 64), lambda t: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((64, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((512, 128), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((512, 128), jnp.float32),
        compiler_params=CP)(idx, val)
    return out


if __name__ == "__main__":
    n = sys.argv[1]
    fn = globals()[f"probe{n}"]
    out = fn()
    print(f"probe{n} OK", np.asarray(out).sum())
