"""Replay data pool for continual SDF training.

Reference: utils/mapper.py:338-438 — a bounded global pool of SDF training
samples (coord / sdf_label / weight / time), appended per frame with random
eviction once capacity is reached, plus a "new data" window used to mix
fresh samples into every batch (get_batch, mapper.py:704-771).

TPU re-design: preallocated device arrays of static capacity; insertion is a
single donated scatter. When full, incoming samples overwrite uniformly
random slots (matching the reference's random eviction) — but samples from
the *current* frame window are tracked by [new_begin, new_end) indices so
batch mixing still works.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pings_tpu.mapping.sampler import SdfSamples


@struct.dataclass
class ReplayPool:
    points: jnp.ndarray       # (P, 3)
    sdf_label: jnp.ndarray    # (P,)
    color_label: jnp.ndarray  # (P, 3)
    sem_label: jnp.ndarray    # (P,) i32; -1 = unlabeled
    weight: jnp.ndarray       # (P,)
    ray: jnp.ndarray          # (P, 3) unit sensor->sample ray direction
    is_free: jnp.ndarray      # (P,) bool
    ts: jnp.ndarray           # (P,) i32
    count: jnp.ndarray        # () i32 filled entries
    new_begin: jnp.ndarray    # () i32 — latest frame's slice start (ring may wrap; see insert)
    new_count: jnp.ndarray    # () i32

    @property
    def capacity(self) -> int:
        return self.points.shape[0]


def init_pool(capacity: int) -> ReplayPool:
    return ReplayPool(
        points=jnp.zeros((capacity, 3)),
        sdf_label=jnp.zeros((capacity,)),
        color_label=jnp.zeros((capacity, 3)),
        sem_label=jnp.full((capacity,), -1, jnp.int32),
        weight=jnp.zeros((capacity,)),
        ray=jnp.zeros((capacity, 3)),
        is_free=jnp.zeros((capacity,), bool),
        ts=jnp.zeros((capacity,), jnp.int32),
        count=jnp.int32(0),
        new_begin=jnp.int32(0),
        new_count=jnp.int32(0),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def pool_insert(
    pool: ReplayPool, s: SdfSamples, cur_ts: jnp.ndarray, key: jax.Array
) -> ReplayPool:
    """Insert valid samples; fills the tail first, then evicts random slots.

    New samples are written contiguously from ``count`` while space remains;
    overflow samples go to uniformly-random existing slots. ``new_begin`` /
    ``new_count`` describe where this frame's samples start (fresh-sample
    mixing reads [new_begin, new_begin + new_count) clipped to tail inserts —
    randomly-evicted overflow rows are reachable through the uniform half of
    the batch anyway)."""
    P = pool.capacity
    n = s.points.shape[0]
    valid = s.valid
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1       # position among valid
    n_valid = jnp.sum(valid.astype(jnp.int32))
    tail_room = P - pool.count
    rnd = jax.random.randint(key, (n,), 0, jnp.maximum(pool.count, 1))
    dest = jnp.where(rank < tail_room, pool.count + rank, rnd)
    dest = jnp.where(valid, dest, P)                      # dump row -> drop

    pts = pool.points.at[dest].set(s.points, mode="drop")
    sdf = pool.sdf_label.at[dest].set(s.sdf_label, mode="drop")
    col = pool.color_label.at[dest].set(s.color_label, mode="drop")
    sem = pool.sem_label.at[dest].set(s.sem_label, mode="drop")
    w = pool.weight.at[dest].set(s.weight, mode="drop")
    ray = pool.ray.at[dest].set(s.normal_label, mode="drop")
    fr = pool.is_free.at[dest].set(s.is_free, mode="drop")
    ts = pool.ts.at[dest].set(cur_ts, mode="drop")
    new_count = jnp.minimum(n_valid, tail_room)
    return pool.replace(
        points=pts, sdf_label=sdf, color_label=col, sem_label=sem, weight=w,
        ray=ray, is_free=fr, ts=ts,
        count=jnp.minimum(pool.count + n_valid, P),
        new_begin=pool.count,
        new_count=jnp.maximum(new_count, jnp.int32(0)),
    )


@functools.partial(jax.jit, static_argnames=("bs", "bs_new"))
def pool_batch(
    pool: ReplayPool, key: jax.Array, bs: int, bs_new: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
           jnp.ndarray]:
    """Sample a training batch: bs_new fresh-frame samples + (bs - bs_new)
    uniform history (reference get_batch, mapper.py:704-771).

    Returns (points, sdf_label, color_label, weight, valid, sem_label,
    ray)."""
    k1, k2 = jax.random.split(key)
    hist = jax.random.randint(k1, (bs - bs_new,), 0,
                              jnp.maximum(pool.count, 1))
    fresh_n = jnp.maximum(pool.new_count, 1)
    fresh = pool.new_begin + jax.random.randint(k2, (bs_new,), 0, fresh_n)
    fresh = jnp.minimum(fresh, jnp.maximum(pool.count - 1, 0))
    idx = jnp.concatenate([fresh, hist])
    valid = jnp.arange(bs) < 1e9  # all valid unless pool empty
    valid = valid & (pool.count > 0)
    return (
        pool.points[idx], pool.sdf_label[idx], pool.color_label[idx],
        pool.weight[idx], valid, pool.sem_label[idx], pool.ray[idx],
    )
