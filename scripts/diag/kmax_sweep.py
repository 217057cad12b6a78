#!/usr/bin/env python3
"""Sweep max_per_tile (Kmax) on the bench scene: throughput vs blend
error against a deep (Kmax=512) reference. The per-tile table, its pack
gather, the gradient scatter and the blend all scale with T*Kmax, and
row-indexed movement (~20ns/row) is the measured floor — Kmax is the
one lever that shrinks rows. Depth-sorted bins keep the FRONT-most
gaussians, so with saturating transmittance truncation error is bounded
to pixels whose front cover is thin."""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))))
import bench
from pings_tpu.ops import raster_pallas as rp

rng = np.random.default_rng(0)
scene = bench.make_scene(rng, bench.N_GAUSS)
K = jnp.array([[900.0, 0, bench.WIDTH / 2], [0, 900.0, bench.HEIGHT / 2],
               [0, 0, 1.0]])
T = jnp.eye(4)

def render_k(kmax, sup):
    f = jax.jit(lambda *s: rp.rasterize_pallas(
        *s, T, K, bench.WIDTH, bench.HEIGHT, max_per_tile=kmax,
        superblock=sup, precision="fast", mode="3dgs"))
    return f(*scene)

ref = render_k(512, 128)
ref_rgb = np.asarray(ref.rgb)
print("ref overflow:", int(ref.n_overflow), flush=True)

for kmax in (64, 96, 128, 192):
    out = render_k(kmax, min(128, kmax))
    err = np.abs(np.asarray(out.rgb) - ref_rgb)
    bench.MAX_PER_TILE = kmax
    bench.SUPERBLOCK = min(128, kmax)
    mpix = bench._train_loop_mpix_s(scene, T, K)
    print(f"kmax={kmax:4d} mpix/s={mpix:6.2f} rgb_err mean={err.mean():.5f} "
          f"p99={np.percentile(err,99):.4f} max={err.max():.3f} "
          f"overflow={int(out.n_overflow)}", flush=True)
