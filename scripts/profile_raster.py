"""Stage-level profile of the rasterization fwd+bwd pipeline on one chip.

Times each stage of rasterize_pallas in isolation plus microbenchmarks of
the primitive ops (sort / scatter / gather) that the VERDICT fingered as
the bottleneck. Run: python scripts/profile_raster.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from pings_tpu.ops import raster_pallas as rp
from pings_tpu.ops.rasterize import bin_gaussians, project_gaussians

# Under the axon relay, block_until_ready is only a true barrier after the
# first device-to-host readback in the process — do one up front or every
# timing below reads ~0.
_ = np.asarray(jnp.ones(8) + 1)

WIDTH, HEIGHT = 1280, 720
N = 200_000
KMAX = 256
TILE = 16


def make_scene(rng, n):
    means = np.stack([
        rng.uniform(-12, 12, n), rng.uniform(-7, 7, n),
        rng.uniform(2.0, 30.0, n),
    ], -1).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scales = rng.uniform(0.02, 0.12, (n, 3)).astype(np.float32)
    opa = rng.uniform(0.2, 0.95, n).astype(np.float32)
    col = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return tuple(jnp.asarray(x) for x in
                 (means, quats, scales, opa, col, np.ones(n, bool)))


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    scene = make_scene(rng, N)
    K = jnp.array([[900.0, 0, WIDTH / 2], [0, 900.0, HEIGHT / 2],
                   [0, 0, 1.0]])
    T = jnp.eye(4)
    tgt = jnp.asarray(rng.random((HEIGHT, WIDTH, 3)), jnp.float32)

    # ---- stage 1: projection fwd ----
    proj = jax.jit(lambda *s: project_gaussians(*s, T, K, WIDTH, HEIGHT))
    p = proj(*scene)
    print(f"project fwd:        {timeit(proj, *scene):7.2f} ms")

    # ---- stage 2: binning ----
    binf = jax.jit(lambda p: bin_gaussians(p, WIDTH, HEIGHT, tile=TILE,
                                           max_per_tile=KMAX))
    bins = binf(p)
    print(f"bin (sort+windows): {timeit(binf, p):7.2f} ms")
    print(f"  total pairs occupied: {int(jnp.sum(bins.counts))}, "
          f"overflow {int(bins.n_overflow)}")

    # ---- stage 3: pack table ----
    attr16 = jax.jit(rp.gauss_attr_matrix)(p)
    packf = jax.jit(rp._pack_table)
    attrs = packf(attr16, bins)
    print(f"pack table:         {timeit(packf, attr16, bins):7.2f} ms")

    ntx = (WIDTH + TILE - 1) // TILE
    nty = (HEIGHT + TILE - 1) // TILE

    # ---- stage 4: blend fwd kernel ----
    fwdk = jax.jit(lambda a, c: rp._blend_fwd_call(a, c, ntx, nty, TILE, 64))
    out, trans = fwdk(attrs, bins.counts)
    print(f"blend fwd kernel:   {timeit(fwdk, attrs, bins.counts):7.2f} ms")

    # ---- stage 5: blend bwd kernel ----
    g_out = jnp.ones_like(out)
    g_trans = jnp.ones_like(trans)
    rho = jnp.sum(g_out * out, axis=1, keepdims=True)
    bwdk = jax.jit(lambda a, c, g, gt, r, tf: rp._blend_bwd_call(
        a, c, g, gt, r, tf, ntx, nty, TILE, 64))
    dt_ = bwdk(attrs, bins.counts, g_out, g_trans, rho, trans)
    print(f"blend bwd kernel:   "
          f"{timeit(bwdk, attrs, bins.counts, g_out, g_trans, rho, trans):7.2f} ms")

    # ---- stage 6: unpack grads (scatter-add) ----
    unpackf = jax.jit(lambda d, b: rp._unpack_grads(d, b, N))
    _ = unpackf(dt_, bins)
    print(f"unpack grads:       {timeit(unpackf, dt_, bins):7.2f} ms")

    # ---- stage 7: projection bwd (via vjp of attr matrix) ----
    def proj_attr(*s):
        return rp.gauss_attr_matrix(project_gaussians(*s, T, K, WIDTH, HEIGHT))
    d_attr = jnp.ones((N, 16))
    pb = jax.jit(lambda *s: jax.vjp(proj_attr, *s)[1](d_attr))
    _ = pb(*scene)
    print(f"project+attr bwd:   {timeit(pb, *scene):7.2f} ms")

    # ---- full pipeline for reference ----
    z3 = jnp.zeros(3)

    def loss(means, quats, scales, opa, col, valid, theta, rho_):
        o = rp.rasterize_pallas(means, quats, scales, opa, col, valid,
                                T, K, WIDTH, HEIGHT, theta=theta, rho=rho_,
                                max_per_tile=KMAX)
        return (jnp.mean(jnp.abs(o.rgb - tgt))
                + 0.01 * jnp.mean(o.depth * o.alpha)
                + 0.01 * jnp.mean(o.alpha))

    gf = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 6, 7)))
    print(f"FULL fwd+bwd:       {timeit(gf, *scene, z3, z3):7.2f} ms")

    # ---- microbenchmarks ----
    print("\n-- primitives --")
    m = 1_800_000
    keys = jnp.asarray(rng.integers(0, 2**31, m, dtype=np.int64),
                       jnp.uint32)
    sortf = jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0])
    _ = sortf(keys)
    print(f"sort {m} u32:        {timeit(sortf, keys):7.2f} ms")

    keys200k = keys[:200_000]
    print(f"sort 200k u32:      {timeit(sortf, keys200k):7.2f} ms")

    depth = jnp.asarray(rng.random(N), jnp.float32)
    argsf = jax.jit(lambda d: jnp.argsort(d))
    _ = argsf(depth)
    print(f"argsort 200k f32:   {timeit(argsf, depth):7.2f} ms")

    idx = jnp.asarray(rng.integers(0, N, m), jnp.int32)
    upd = jnp.asarray(rng.random((m, 16)), jnp.float32)
    scatf = jax.jit(lambda i, u: jnp.zeros((N, 16)).at[i].add(u))
    _ = scatf(idx, upd)
    print(f"scatter-add (1.8M,16)->(200k,16): {timeit(scatf, idx, upd):7.2f} ms")

    scat1 = jax.jit(lambda i, u: jnp.zeros((N,)).at[i].add(u))
    u1 = upd[:, 0]
    _ = scat1(idx, u1)
    print(f"scatter-add (1.8M,)->(200k,):     {timeit(scat1, idx, u1):7.2f} ms")

    tgt_sz = 921_600
    idx2 = jnp.asarray(rng.permutation(np.arange(m))[:m], jnp.int32) % tgt_sz
    vals = jnp.asarray(rng.integers(0, N, m), jnp.int32)
    scset = jax.jit(lambda i, v: jnp.zeros((tgt_sz,), jnp.int32)
                    .at[i].set(v, mode="drop", unique_indices=True))
    _ = scset(idx2, vals)
    print(f"scatter-set 1.8M i32 (unique):    {timeit(scset, idx2, vals):7.2f} ms")

    src = jnp.asarray(rng.random((tgt_sz, 16)), jnp.float32)
    gatf = jax.jit(lambda s, i: s[i])
    _ = gatf(src, idx2)
    print(f"gather (1.8M,16) rows:            {timeit(gatf, src, idx2):7.2f} ms")

    src1 = src[:, 0]
    gat1 = jax.jit(lambda s, i: s[i])
    _ = gat1(src1, idx2)
    print(f"gather (1.8M,) elems:             {timeit(gat1, src1, idx2):7.2f} ms")


if __name__ == "__main__":
    main()
