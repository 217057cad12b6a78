"""Stage-by-stage profile of the rasterization fwd+bwd step.

Times (on the real chip): projection fwd, binning (key build + sort +
searchsorted + window), pack gather, Pallas blend fwd, Pallas blend bwd,
grad unpack scatter-add, projection bwd, and the full fused grad step —
so optimization effort goes where the milliseconds are.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pings_tpu.ops import raster_pallas as rp
from pings_tpu.ops import rasterize as rz

WIDTH, HEIGHT = 1280, 720
N_GAUSS = 200_000
MAX_PER_TILE = 256
TILE = 16


def timed(fn, *args, iters=10, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    means = np.stack([
        rng.uniform(-12, 12, N_GAUSS), rng.uniform(-7, 7, N_GAUSS),
        rng.uniform(2.0, 30.0, N_GAUSS),
    ], -1).astype(np.float32)
    quats = rng.normal(size=(N_GAUSS, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scales = rng.uniform(0.02, 0.12, (N_GAUSS, 3)).astype(np.float32)
    opa = rng.uniform(0.2, 0.95, N_GAUSS).astype(np.float32)
    col = rng.uniform(0, 1, (N_GAUSS, 3)).astype(np.float32)
    valid = np.ones(N_GAUSS, bool)
    scene = tuple(jnp.asarray(x) for x in (means, quats, scales, opa, col,
                                           valid))
    K = jnp.array([[900.0, 0, WIDTH / 2], [0, 900.0, HEIGHT / 2],
                   [0, 0, 1.0]])
    T = jnp.eye(4)
    tgt = jnp.asarray(rng.random((HEIGHT, WIDTH, 3)), jnp.float32)
    z3 = jnp.zeros(3)

    ntx = (WIDTH + TILE - 1) // TILE
    nty = (HEIGHT + TILE - 1) // TILE

    # ---- stage pieces ----
    @jax.jit
    def stage_project(means, quats, scales, opa, col, valid):
        return rz.project_gaussians(means, quats, scales, opa, col, valid,
                                    T, K, WIDTH, HEIGHT)

    p = stage_project(*scene)
    print(f"project fwd:        {timed(stage_project, *scene):7.2f} ms")

    @jax.jit
    def stage_bin(p):
        return rz.bin_gaussians(p, WIDTH, HEIGHT, tile=TILE,
                                max_per_tile=MAX_PER_TILE)

    bins = stage_bin(p)
    n_pairs = int(np.sum(np.asarray(bins.counts)))
    print(f"bin (full):         {timed(stage_bin, p):7.2f} ms"
          f"   [{n_pairs} pairs kept, overflow={int(bins.n_overflow)}]")

    @jax.jit
    def stage_attr(p):
        return rp.gauss_attr_matrix(p)

    attr16 = stage_attr(p)
    print(f"attr matrix:        {timed(stage_attr, p):7.2f} ms")

    @jax.jit
    def stage_pack(attr16, bins):
        return rp._pack_table(attr16, bins)

    attrs = stage_pack(attr16, bins)
    print(f"pack gather:        {timed(stage_pack, attr16, bins):7.2f} ms")

    @jax.jit
    def stage_fwd(attrs, counts):
        return rp._blend_fwd_call(attrs, counts, ntx, nty, TILE)

    out, trans = stage_fwd(attrs, bins.counts)
    print(f"blend fwd kernel:   {timed(stage_fwd, attrs, bins.counts):7.2f} ms")

    g_out = jnp.ones_like(out)
    g_trans = jnp.ones_like(trans)
    rho = jnp.sum(g_out * out, axis=1, keepdims=True)

    @jax.jit
    def stage_bwd(attrs, counts, g_out, g_trans, rho, trans):
        return rp._blend_bwd_call(attrs, counts, g_out, g_trans, rho, trans,
                                  ntx, nty, TILE)

    dtable = stage_bwd(attrs, bins.counts, g_out, g_trans, rho, trans)
    print(f"blend bwd kernel:   "
          f"{timed(stage_bwd, attrs, bins.counts, g_out, g_trans, rho, trans):7.2f} ms")

    @jax.jit
    def stage_unpack(dtable, bins):
        return rp._unpack_grads(dtable, bins, N_GAUSS)

    print(f"unpack scatter-add: {timed(stage_unpack, dtable, bins):7.2f} ms")

    # projection backward alone (vjp through project + attr matrix)
    @jax.jit
    def stage_proj_bwd(means, quats, scales, opa, col, valid, d_attr):
        def f(m, q, s, o, c):
            pp = rz.project_gaussians(m, q, s, o, c, valid, T, K, WIDTH,
                                      HEIGHT)
            return rp.gauss_attr_matrix(pp)
        _, vjp = jax.vjp(f, means, quats, scales, opa, col)
        return vjp(d_attr)

    d_attr = stage_unpack(dtable, bins)
    print(f"project+attr bwd:   "
          f"{timed(stage_proj_bwd, *scene, d_attr):7.2f} ms")

    # ---- full fused step (bench loss) ----
    def loss(means, quats, scales, opa, col, valid, theta, rho_):
        o = rp.rasterize_pallas(means, quats, scales, opa, col, valid,
                                T, K, WIDTH, HEIGHT, theta=theta, rho=rho_,
                                max_per_tile=MAX_PER_TILE)
        return (jnp.mean(jnp.abs(o.rgb - tgt))
                + 0.01 * jnp.mean(o.depth * o.alpha)
                + 0.01 * jnp.mean(o.alpha))

    grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 6, 7)))
    full = timed(grad_fn, *scene, z3, z3)
    print(f"FULL fwd+bwd:       {full:7.2f} ms"
          f"   -> {WIDTH * HEIGHT / full / 1e3:.1f} Mpix/s")

    fwd_only = jax.jit(loss)
    print(f"fwd only:           {timed(fwd_only, *scene, z3, z3):7.2f} ms")


if __name__ == "__main__":
    main()
