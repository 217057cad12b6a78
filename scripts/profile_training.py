#!/usr/bin/env python3
"""Microbenchmark the mapping-loop hot path on the current backend.

Times (ms/iter, post-compile):
- query_feature (heavy+light fused)  on a bs-sized batch
- query_neighbor_idx alone (the heavy half)
- full jitted sdf_step (BCE + eikonal + color, backward + adam)
- full jitted gsdf step's SDF-side components

Usage: python scripts/profile_training.py [--bs 4096] [--n 200000]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pings_tpu.config import Config
from pings_tpu.models import decoder as dec, field, neural_points as npm
from pings_tpu.mapping import sdf_mapper


def timeit(fn, *args, reps=20, warmup=3, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=4096)
    ap.add_argument("--n", type=int, default=200_000)
    args = ap.parse_args()

    cfg = Config.load(overrides=dict(
        max_points=1 << 19, buffer_size=1 << 21, voxel_size_m=0.3,
        bs=args.bs, surface_sample_range_m=-1.0,
        free_sample_end_dist_m=-1.0, sigma_sigmoid_m=-1.0,
        geo_mlp_hidden_dim=64, color_mlp_hidden_dim=64))
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    m = npm.init_map(cfg, key)
    decoders = dec.init_decoders(jax.random.PRNGKey(1), cfg)

    # populate a street-scale map: points on a ground plane + walls
    n = args.n
    pts = np.empty((n, 3), np.float32)
    half = n // 2
    pts[:half] = np.stack([rng.uniform(0, 120, half),
                           rng.uniform(-12, 12, half),
                           np.zeros(half)], -1)
    pts[half:] = np.stack([rng.uniform(0, 120, n - half),
                           rng.uniform(8, 12, n - half) *
                           np.sign(rng.standard_normal(n - half)),
                           rng.uniform(0, 4, n - half)], -1)
    td = jnp.zeros(100000)
    m = npm.insert_points(
        m, jnp.asarray(pts), jnp.zeros((n, 3)), jnp.ones(n, bool),
        jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)), jnp.int32(0), td,
        jnp.float32(1e9))
    print(f"map points: {int(m.count)}", flush=True)

    qpts = jnp.asarray(pts[rng.choice(n, args.bs, replace=False)]
                       + rng.normal(0, 0.1, (args.bs, 3)), jnp.float32)
    k, r, al = cfg.query_nn_k, cfg.num_nei_cells, cfg.search_alpha
    sigma_scale = cfg.logistic_gaussian_ratio * cfg.sigma_sigmoid_m

    t_q = timeit(lambda: jax.block_until_ready(npm.query_feature(
        m, qpts, k, r, al)))
    t_h = timeit(lambda: jax.block_until_ready(npm.query_neighbor_idx(
        m, qpts, k, r, al)))
    sdf_fn = jax.jit(lambda qq: field.sdf_at(m, decoders, qq, sigma_scale,
                                             k, r, al)[0])
    t_s = timeit(lambda: jax.block_until_ready(sdf_fn(qpts)))
    gradn_fn = jax.jit(lambda qq: field.sdf_grad_numerical(
        m, decoders, qq, sigma_scale, 0.06, k, r, al))
    t_gn = timeit(lambda: jax.block_until_ready(gradn_fn(qpts)))
    grada_fn = jax.jit(lambda qq: field.sdf_grad_analytical(
        m, decoders, qq, sigma_scale, k, r, al)[1])
    t_ga = timeit(lambda: jax.block_until_ready(grada_fn(qpts)))

    # full sdf training step
    opt, params, state = sdf_mapper.init_sdf_train(m, decoders, cfg)
    step = sdf_mapper.make_sdf_step(cfg, opt)
    batch = (qpts, jnp.zeros(args.bs), jnp.zeros((args.bs, 3)),
             jnp.ones(args.bs), jnp.ones(args.bs, bool))
    # donated args: re-init params/state per rep is unfair; run a ping-pong
    def run_step():
        nonlocal params, state
        params, state, met = step(params, state, batch, m, decoders,
                                  jnp.asarray(False))
        return met
    for _ in range(3):
        out = run_step()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = run_step()
    jax.block_until_ready(out)
    t_step = (time.perf_counter() - t0) / 20 * 1e3

    print(f"bs={args.bs} stencil_r={r} alpha={al} k={k} "
          f"S={len(npm.make_stencil(r, al))}")
    print(f"query_feature      : {t_q:7.2f} ms")
    print(f"query_neighbor_idx : {t_h:7.2f} ms")
    print(f"sdf_at             : {t_s:7.2f} ms")
    print(f"sdf_grad_numerical : {t_gn:7.2f} ms")
    print(f"sdf_grad_analytical: {t_ga:7.2f} ms")
    print(f"sdf_step (fwd+bwd) : {t_step:7.2f} ms")


if __name__ == "__main__":
    main()
