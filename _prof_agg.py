import time, numpy as np, jax, jax.numpy as jnp

N = 200_000
TK = 512 * 3600          # 1.84M slots
M = N * 36               # 7.2M pairs
rng = np.random.default_rng(0)

def bench(name, fn, *args, iters=8):
    float(jnp.sum(fn(jnp.float32(0.0), *args)))   # compile+warm
    t0 = time.perf_counter()
    for i in range(iters):
        v = fn(jnp.float32((i + 1) * 1e-12), *args)
    float(jnp.sum(v))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.2f} ms", flush=True)

tbl = jnp.asarray(rng.random((TK, 16)).astype(np.float32))
perm = jnp.asarray(rng.permutation(TK).astype(np.int32))
idx72 = jnp.asarray(rng.integers(0, TK, M).astype(np.int32))
gid_slot = jnp.asarray(np.sort(rng.integers(0, N, TK)).astype(np.int32))  # sorted gids
gid_unsorted = jnp.asarray(rng.integers(0, N, TK).astype(np.int32))
flat1d = jnp.asarray(rng.random(TK).astype(np.float32))

bench("rowgather_perm_1.84M_16ch", jax.jit(lambda e, t, p: t[p] + e), tbl, perm)
bench("rowgather_7.2M_16ch", jax.jit(lambda e, t, i: t[i] + e), tbl, idx72)
bench("gather1d_7.2M", jax.jit(lambda e, f, i: f[i] + e), flat1d, idx72)
bench("take_along_perm_16ch", jax.jit(lambda e, t, p: jnp.take(t, p, axis=0, indices_are_sorted=False, unique_indices=True) + e), tbl, perm)

key = jnp.asarray(rng.integers(0, 1 << 30, TK).astype(np.int32))
vals16 = tuple(tbl[:, i] for i in range(16))
bench("sort_1.84M_k+16f32", jax.jit(lambda e, k, *vs: jax.lax.sort((k + jnp.int32(0),) + tuple(v + e for v in vs), num_keys=1)[1]), key, *vals16)
bench("sort_1.84M_k+2i32", jax.jit(lambda e, k: jax.lax.sort((k, k, k), num_keys=1)[1] + jnp.int32(0) + e.astype(jnp.int32)), key)

# segment-sum designs: aggregate (TK,16) rows by sorted gid into (N,16)
def seg_cumsum(e, t, gid):
    cs = jnp.cumsum(t + e, axis=0)
    starts = jnp.searchsorted(gid, jnp.arange(N + 1, dtype=jnp.int32)).astype(jnp.int32)
    bound = jnp.concatenate([jnp.zeros((1, 16), t.dtype), cs])[starts]
    return bound[1:] - bound[:-1]
bench("segsum_cumsum_boundary", jax.jit(seg_cumsum), tbl, gid_slot)

bench("segsum_xla_sorted", jax.jit(lambda e, t, g: jax.ops.segment_sum(t + e, g, num_segments=N, indices_are_sorted=True)), tbl, gid_slot)
bench("scatter_add_unsorted", jax.jit(lambda e, t, g: jnp.zeros((N, 16), jnp.float32).at[g].add(t + e)), tbl, gid_unsorted)

# windowed gather: (N, 36) windows from sorted table via starts
def windowed(e, t, gid):
    starts = jnp.searchsorted(gid, jnp.arange(N, dtype=jnp.int32)).astype(jnp.int32)
    w = starts[:, None] + jnp.arange(36, dtype=jnp.int32)[None, :]
    w = jnp.minimum(w, TK - 1)
    g = (t + e)[w]                      # (N, 36, 16)
    return jnp.sum(g, axis=1)
bench("windowed_gather_sum", jax.jit(windowed), tbl, gid_slot)
