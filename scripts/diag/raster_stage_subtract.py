"""Subtractive in-context costing of the raster training iteration.

Isolated stage timings (bench.py stage_breakdown) sum to ~2x the real
amortized iteration, so the bookends' true marginal cost must be
measured inside the fused grad step. Ladder (all jitted, bins cached):

  full        grad wrt (means..., theta, rho)  — the shipping iteration
  attr        grad wrt attr16: pack+blend+assemble+unpack only
  packed      grad wrt the packed (T,Kmax,16) table: blend+assemble only
  packed_nb   packed without assemble (raw kernel outputs summed)

full-attr    = project + attr_matrix (+ their bwd)
attr-packed  = pack gather + unpack scatter (the bookends, in context)
packed       = fwd+bwd kernels + assemble in context

Also measures a sentinel-row pack (gather from (N+1,16) with masked
slots pointing at an appended zero row — no where-mask pass) and the
matching unpack (scatter into (N+1,16), slice off).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, ".")
from bench import HEIGHT, MAX_PER_TILE, SUPERBLOCK, WIDTH, make_scene

from pings_tpu.ops import raster_pallas as rp
from pings_tpu.ops.rasterize import bin_gaussians, project_gaussians

N = 200_000
FAST = True


def timeit(fn, *args, iters=12, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    _ = np.asarray(jnp.ones(8) + 1)
    rng = np.random.default_rng(0)
    scene = make_scene(rng, N)
    K = jnp.array([[900.0, 0, WIDTH / 2], [0, 900.0, HEIGHT / 2],
                   [0, 0, 1.0]])
    T = jnp.eye(4)
    tgt = jnp.asarray(rng.random((HEIGHT, WIDTH, 3)), jnp.float32)
    z3 = jnp.zeros(3)
    tile = 16
    ntx = (WIDTH + tile - 1) // tile
    nty = (HEIGHT + tile - 1) // tile

    def lossv(out, trans):
        rgb, depth, alpha, normal, _ = rp.assemble_blend(
            out, trans, jnp.zeros_like(trans), jnp.zeros(3), WIDTH, HEIGHT,
            tile, "3dgs", True)
        return (jnp.mean(jnp.abs(rgb - tgt))
                + 0.01 * jnp.mean(depth * alpha) + 0.01 * jnp.mean(alpha))

    # shared bins
    p = jax.jit(lambda *s: project_gaussians(*s, T, K, WIDTH, HEIGHT))(
        *scene)
    bins = jax.jit(lambda p: bin_gaussians(
        p, WIDTH, HEIGHT, tile=tile, max_per_tile=MAX_PER_TILE))(p)
    attr16 = jax.jit(rp.gauss_attr_matrix)(p)
    packed = jax.jit(rp._pack_table)(attr16, bins)

    # ---- full: the shipping cached-bins iteration ----------------------
    def full_loss(means, quats, scales, opa, col, valid, theta, rho):
        out = rp.rasterize_pallas(means, quats, scales, opa, col, valid,
                                  T, K, WIDTH, HEIGHT, theta=theta,
                                  rho=rho, max_per_tile=MAX_PER_TILE,
                                  superblock=SUPERBLOCK, precision="fast",
                                  bins=bins)
        return (jnp.mean(jnp.abs(out.rgb - tgt))
                + 0.01 * jnp.mean(out.depth * out.alpha)
                + 0.01 * jnp.mean(out.alpha))

    g_full = jax.jit(jax.grad(full_loss, argnums=(0, 1, 2, 3, 4, 6, 7)))
    ms_full = timeit(g_full, *scene, z3, z3)

    # ---- attr: bookends + kernels, no projection -----------------------
    def attr_loss(a16):
        out, trans, _ = rp._blend_gaussians(a16, bins, None, ntx, nty,
                                            tile, SUPERBLOCK, "3dgs", FAST)
        return lossv(out, trans)

    g_attr = jax.jit(jax.grad(attr_loss))
    ms_attr = timeit(g_attr, attr16)

    # ---- packed: kernels only (custom fwd/bwd calls, no pack/unpack) ---
    def packed_loss_grad(attrs):
        out, trans, _ = rp._blend_fwd_call(attrs, bins.counts, ntx, nty,
                                           tile, SUPERBLOCK, "3dgs", FAST)
        l, (g_out, g_trans) = jax.value_and_grad(
            lambda o, t: lossv(o, t), argnums=(0, 1))(out, trans)
        rho = jnp.sum(g_out * out, axis=1, keepdims=True)
        dt = rp._blend_bwd_call(attrs, bins.counts, g_out, g_trans, rho,
                                trans, ntx, nty, tile, SUPERBLOCK, "3dgs",
                                FAST)
        return dt

    g_packed = jax.jit(packed_loss_grad)
    ms_packed = timeit(g_packed, packed)

    # ---- sentinel pack/unpack (no where-mask, no index clamp) ----------
    def sentinel_pack(a16, tbl):
        a17 = jnp.concatenate([a16, jnp.zeros((1, 16), a16.dtype)], 0)
        return a17[tbl]

    tbl_sent = jnp.where(bins.mask, bins.gauss_tbl, N).astype(jnp.int32)
    sp = jax.jit(sentinel_pack)
    ms_sp = timeit(sp, attr16, tbl_sent)

    def sentinel_unpack(dtable, tbl):
        flat = dtable.reshape(-1, 16)
        return jnp.zeros((N + 1, 16), dtable.dtype).at[
            tbl.reshape(-1)].add(flat)[:N]

    su = jax.jit(sentinel_unpack)
    dt0 = g_packed(packed)
    ms_su = timeit(su, dt0, tbl_sent)

    # current pack/unpack isolated, for the same-run comparison
    ms_pack0 = timeit(jax.jit(rp._pack_table), attr16, bins)
    ms_unpack0 = timeit(jax.jit(lambda d, b: rp._unpack_grads(d, b, N)),
                        dt0, bins)

    # attr-level iteration with sentinel bookends, in context: the real
    # computation graph of pack -> fwd -> bwd -> unpack chained manually
    def attr_grad_sent(a16):
        a17 = jnp.concatenate([a16, jnp.zeros((1, 16), a16.dtype)], 0)
        attrs = a17[tbl_sent]
        out, trans, _ = rp._blend_fwd_call(attrs, bins.counts, ntx, nty,
                                           tile, SUPERBLOCK, "3dgs", FAST)
        _, (g_out, g_trans) = jax.value_and_grad(
            lambda o, t: lossv(o, t), argnums=(0, 1))(out, trans)
        rho = jnp.sum(g_out * out, axis=1, keepdims=True)
        dt = rp._blend_bwd_call(attrs, bins.counts, g_out, g_trans, rho,
                                trans, ntx, nty, tile, SUPERBLOCK, "3dgs",
                                FAST)
        return sentinel_unpack(dt, tbl_sent)

    g_attr_sent = jax.jit(attr_grad_sent)
    ms_attr_sent = timeit(g_attr_sent, attr16)

    print(f"full grad step (cached bins): {ms_full:7.2f} ms")
    print(f"attr grad (bookends+kernels): {ms_attr:7.2f} ms")
    print(f"attr grad, sentinel bookends: {ms_attr_sent:7.2f} ms")
    print(f"packed grad (kernels only):   {ms_packed:7.2f} ms")
    print(f"  -> project+attr marginal:   {ms_full - ms_attr:7.2f} ms")
    print(f"  -> bookends marginal:       {ms_attr - ms_packed:7.2f} ms")
    print(f"isolated: pack {ms_pack0:.2f} / sentinel {ms_sp:.2f} ms; "
          f"unpack {ms_unpack0:.2f} / sentinel {ms_su:.2f} ms")


if __name__ == "__main__":
    main()
