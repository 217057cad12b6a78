"""Shared synthetic-scene fixtures for SLAM tests."""

import jax
import jax.numpy as jnp
import numpy as np

from pings_tpu.mapping import pool as rp, sdf_mapper
from pings_tpu.mapping.sampler import sample_rays_cfg
from pings_tpu.models import decoder as dec, neural_points as npm


def corner_scan(rng, n, sensor):
    """Sample points on three orthogonal plane patches meeting at the
    origin (an inside room corner seen from ``sensor`` in the positive
    octant). Returns (points, colors)."""
    per = n // 3
    u = rng.uniform(0.2, 3.0, (per, 2))
    p_x = np.stack([np.zeros(per), u[:, 0], u[:, 1]], -1)   # x=0 plane
    p_y = np.stack([u[:, 0], np.zeros(per), u[:, 1]], -1)   # y=0 plane
    p_z = np.stack([u[:, 0], u[:, 1], np.zeros(per)], -1)   # z=0 plane
    pts = np.concatenate([p_x, p_y, p_z]).astype(np.float32)
    colors = np.concatenate([
        np.tile([0.8, 0.2, 0.2], (per, 1)),
        np.tile([0.2, 0.8, 0.2], (per, 1)),
        np.tile([0.2, 0.2, 0.8], (per, 1)),
    ]).astype(np.float32)
    return pts, colors


def build_trained_corner_map(rng, cfg, sensor=np.array([2.0, 2.0, 2.0]),
                             n_scan=3000, iters=250):
    """Insert a corner scan + train the SDF field; returns (map, decoders)."""
    pts, colors = corner_scan(rng, n_scan, sensor)
    m = npm.init_map(cfg)
    decoders = dec.init_decoders(jax.random.PRNGKey(0), cfg)
    mask = jnp.ones(len(pts), bool)
    m = npm.insert_points(
        m, jnp.asarray(pts), jnp.asarray(colors), mask,
        jnp.tile(jnp.array([1.0, 0, 0, 0]), (len(pts), 1)),
        jnp.int32(0), jnp.zeros(8), jnp.float32(1e9))

    pool = rp.init_pool(cfg.pool_capacity)
    s = sample_rays_cfg(jax.random.PRNGKey(1), jnp.asarray(pts),
                        jnp.asarray(colors), mask,
                        jnp.asarray(sensor, jnp.float32), cfg)
    pool = rp.pool_insert(pool, s, jnp.int32(0), jax.random.PRNGKey(2))

    opt, params, ost = sdf_mapper.init_sdf_train(m, decoders, cfg)
    step = sdf_mapper.make_sdf_step(cfg, opt)
    for i in range(iters):
        b = rp.pool_batch(pool, jax.random.PRNGKey(100 + i), cfg.bs, 256)
        params, ost, _ = step(params, ost, b, m, decoders, jnp.asarray(False))
    m, decoders = sdf_mapper.apply_sdf_params(m, decoders, params)
    return m, decoders
