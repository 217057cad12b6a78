"""Headline benchmark: differentiable rasterization forward+backward
throughput (Mpix/s) on one chip.

Matches the BASELINE.json metric ("Raster fwd+bwd Mpix/s per chip").
``vs_baseline`` is measured against an A100-class CUDA 3DGS training
throughput estimate of 50 Mpix/s fwd+bwd (3DGS-style trainers run
~25-50 training iterations/s at ~1-2 Mpix on A100; the north-star target
of >3x A100 therefore corresponds to vs_baseline >= 3.0). The scene is
deliberately hostile: 200k gaussians all in frustum, ~200 average depth
complexity (a typical trained 3DGS scene shows 20-60; the
"typical_scene" extra line measures that regime too).

The measured loop is exactly the shipping training path
(mapping/gs_mapper + slam/pipeline): precision="fast" single-pass bf16
blend dots and tile tables re-built every ``REBIN_EVERY`` iterations and
reused in between (both are the config defaults consumed by render();
the drift guard is moot here because the bench scene is static, matching
the within-a-few-iterations regime of GS training where spawned
gaussians move by bounded MLP displacements).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline",
"stages_ms", ...} — stages_ms is the per-stage breakdown (project / bin /
pack / blend fwd / blend bwd / grad unpack) measured in isolation;
extra keys: mpix_s_rebin1 (re-binning every iteration),
surfel_mpix_s (the reference's default gs_type on the same scene),
typical_scene_mpix_s (realistic ~40 depth complexity).
"""

import json
import time

import numpy as np

A100_BASELINE_MPIX_S = 50.0

WIDTH, HEIGHT = 1280, 720
N_GAUSS = 200_000
# 128 deep-slots-per-tile: blending is transmittance-gated, so slots
# past ~the first hundred are fully occluded on this scene (64 measured
# a 0.24 max rgb error on it — kept at 128); the table, its pack gather
# and the gradient scatter-add all shrink with Kmax.
MAX_PER_TILE = 128
SUPERBLOCK = 128   # blend-loop granularity (128 beat 64/32 on v5e: fewer
                   # loop/cond overheads outweigh early termination, and
                   # sb=32 re-measured worse again in round 3)
PRECISION = "fast"  # config default (config.raster_precision): max |rgb|
                    # drift vs the high-precision path 4.5e-3 (mean
                    # 5.6e-4) — below the CUDA reference's run-to-run
                    # nondeterminism
REBIN_EVERY = 8     # config default (config.raster_rebin_every)
WARMUP_CYCLES = 1
CYCLES = 6          # timed rebin cycles (CYCLES * REBIN_EVERY iters)


def make_scene(rng, n, spread=(12, 7, 2.0, 30.0), smin=0.02, smax=0.12):
    import jax.numpy as jnp

    sx, sy, z0, z1 = spread
    means = np.stack([
        rng.uniform(-sx, sx, n), rng.uniform(-sy, sy, n),
        rng.uniform(z0, z1, n),
    ], -1).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scales = rng.uniform(smin, smax, (n, 3)).astype(np.float32)
    opa = rng.uniform(0.2, 0.95, n).astype(np.float32)
    col = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return tuple(jnp.asarray(x) for x in
                 (means, quats, scales, opa, col, np.ones(n, bool)))


def _timeit(fn, *args, iters=10, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def _train_loop_mpix_s(scene, T, K, mode="3dgs", rebin_every=REBIN_EVERY):
    """Amortized training-loop throughput: grads w.r.t. all gaussian
    params + camera pose, tile tables rebuilt every ``rebin_every``
    iterations (the gs_mapper loop's exact structure)."""
    import jax
    import jax.numpy as jnp
    from pings_tpu.ops import raster_pallas as rp

    rng = np.random.default_rng(1)
    tgt = jnp.asarray(rng.random((HEIGHT, WIDTH, 3)), jnp.float32)
    z3 = jnp.zeros(3)

    def loss(means, quats, scales, opa, col, valid, theta, rho, bins):
        out = rp.rasterize_pallas(means, quats, scales, opa, col, valid,
                                  T, K, WIDTH, HEIGHT, theta=theta,
                                  rho=rho, max_per_tile=MAX_PER_TILE,
                                  superblock=SUPERBLOCK,
                                  precision=PRECISION, mode=mode,
                                  bins=bins)
        return (jnp.mean(jnp.abs(out.rgb - tgt))
                + 0.01 * jnp.mean(out.depth * out.alpha)
                + 0.01 * jnp.mean(out.alpha))

    grad_cached = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4, 6, 7)))

    def fresh(means, quats, scales, opa, col, valid, theta, rho):
        out, bins, means2d = rp.rasterize_pallas(
            means, quats, scales, opa, col, valid, T, K, WIDTH, HEIGHT,
            theta=theta, rho=rho, max_per_tile=MAX_PER_TILE,
            superblock=SUPERBLOCK, precision=PRECISION, mode=mode,
            return_bins=True)
        l = (jnp.mean(jnp.abs(out.rgb - tgt))
             + 0.01 * jnp.mean(out.depth * out.alpha)
             + 0.01 * jnp.mean(out.alpha))
        return l, bins

    grad_fresh = jax.jit(jax.grad(fresh, argnums=(0, 1, 2, 3, 4, 6, 7),
                                  has_aux=True))

    def cycle():
        g, bins = grad_fresh(*scene, z3, z3)
        for _ in range(rebin_every - 1):
            g = grad_cached(*scene, z3, z3, bins)
        return g

    for _ in range(WARMUP_CYCLES):
        out = cycle()
    import jax
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(CYCLES):
        out = cycle()
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    iters = CYCLES * rebin_every
    return WIDTH * HEIGHT * iters / dt / 1e6


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
    fwdk = jax.jit(lambda a, c: rp._blend_fwd_call(
        a, c, ntx, nty, tile, SUPERBLOCK, "3dgs", fast))
    out, trans, _ = fwdk(attrs, bins.counts)
    g_out = jnp.ones_like(out)
    g_trans = jnp.ones_like(trans)
    rho = jnp.sum(g_out * out, axis=1, keepdims=True)
    bwdk = jax.jit(lambda a, c, g, gt, r, tf: rp._blend_bwd_call(
        a, c, g, gt, r, tf, ntx, nty, tile, SUPERBLOCK, "3dgs", fast))
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

    # establish a real host sync point first: under the axon relay,
    # block_until_ready is only a true barrier after the first D2H readback
    _ = np.asarray(jnp.ones(8) + 1)

    rng = np.random.default_rng(0)
    scene = make_scene(rng, N_GAUSS)
    K = jnp.array([[900.0, 0, WIDTH / 2], [0, 900.0, HEIGHT / 2],
                   [0, 0, 1.0]])
    T = jnp.eye(4)

    mpix_s = _train_loop_mpix_s(scene, T, K)
    mpix_rebin1 = _train_loop_mpix_s(scene, T, K, rebin_every=1)
    # turbo point of the measured quality/throughput curve: Kmax=64
    # halves the per-tile table and its row-indexed pack/scatter (the
    # measured per-row floor is address-independent —
    # scripts/diag/masked_row_cost.py), at a truncation cost of
    # mean |rgb| err 0.0038 / p99 0.037 vs a Kmax=512 reference on this
    # hostile scene (scripts/diag/kmax_sweep.py). The headline stays the
    # shipping quality point (Kmax=128, mean err 4e-4).
    global MAX_PER_TILE, SUPERBLOCK
    MAX_PER_TILE, SUPERBLOCK = 64, 64
    mpix_turbo = _train_loop_mpix_s(scene, T, K)
    MAX_PER_TILE, SUPERBLOCK = 128, 128
    # surfel: same scene flattened to discs (the reference default mode)
    scales_flat = scene[2].at[:, 2].set(1e-7)
    scene_s = scene[:2] + (scales_flat,) + scene[3:]
    mpix_surfel = _train_loop_mpix_s(scene_s, T, K, mode="surfel")
    # typical trained-scene regime: smaller splats spread over a wider
    # frustum (~40 avg depth complexity instead of ~200)
    scene_t = make_scene(np.random.default_rng(2), N_GAUSS,
                         spread=(25, 14, 2.0, 60.0), smin=0.01, smax=0.06)
    mpix_typical = _train_loop_mpix_s(scene_t, T, K)

    print(json.dumps({
        "metric": "raster_fwd_bwd_mpix_per_s",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / A100_BASELINE_MPIX_S, 3),
        "rebin_every": REBIN_EVERY,
        "mpix_s_rebin1": round(mpix_rebin1, 2),
        "turbo_kmax64_mpix_s": round(mpix_turbo, 2),
        "surfel_mpix_s": round(mpix_surfel, 2),
        "typical_scene_mpix_s": round(mpix_typical, 2),
        "stages_ms": stage_breakdown(scene, T, K),
    }))


if __name__ == "__main__":
    main()
