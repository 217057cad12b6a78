import time, numpy as np, jax, jax.numpy as jnp
from pings_tpu.ops import rasterize as rz

WIDTH, HEIGHT = 1280, 720
N = 200_000
MPT = 512
SPAN_S, SPAN_L = 9, 36
LCAP = min(N, max(512, N // 8))
M = N * SPAN_S + LCAP * SPAN_L
T_TILES = (WIDTH // 16) * (HEIGHT // 16)
rng = np.random.default_rng(0)
means = np.stack([rng.uniform(-12,12,N), rng.uniform(-7,7,N), rng.uniform(2,30,N)],-1).astype(np.float32)
quats = rng.normal(size=(N,4)).astype(np.float32); quats/=np.linalg.norm(quats,axis=-1,keepdims=True)
scales = rng.uniform(0.02,0.12,(N,3)).astype(np.float32)
opa = rng.uniform(0.2,0.95,N).astype(np.float32)
col = rng.uniform(0,1,(N,3)).astype(np.float32)
scene = tuple(jnp.asarray(x) for x in (means,quats,scales,opa,col,np.ones(N,bool)))
K = jnp.array([[900.,0,WIDTH/2],[0,900.,HEIGHT/2],[0,0,1.]])
T4 = jnp.eye(4)

def bench(name, fn, *args, iters=10):
    o = fn(*args); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(iters): o = fn(*args)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.2f} ms", flush=True)

def base(*s):
    p = rz.project_gaussians(*s, T4, K, WIDTH, HEIGHT)
    b = rz.bin_gaussians(p, WIDTH, HEIGHT, max_per_tile=MPT)
    dtable = (p.opacity[b.perm[jnp.minimum(b.rank_tbl, N-1)]][..., None]
              * jnp.ones((1, 1, 16)))          # stand-in per-slot grads
    return p, b, dtable

@jax.jit
def f_base(*s):
    p, b, dtable = base(*s)
    return jnp.sum(dtable[::7, ::7])
bench("upto_dtable", f_base, *scene)

@jax.jit
def f_scatter_add(*s):
    p, b, dtable = base(*s)
    idx = jnp.minimum(b.rank_tbl.reshape(-1), N-1)
    d_rank = jnp.zeros((N, 16)).at[idx].add(dtable.reshape(-1, 16))
    return jnp.sum(d_rank[b.rank][::7])
bench("scatter_add (current)", f_scatter_add, *scene)

# variant: sort carries pair-origin payload; unpack via unique scatter-set
@jax.jit
def f_scatter_set(*s):
    p, b, dtable = base(*s)
    # simulate the payload: pretend we stored orig-pair index per slot
    orig_tbl = jnp.minimum(b.rank_tbl.reshape(-1) * 13 % M, M-1)  # fake unique-ish
    d_pairs = jnp.zeros((M + 1, 16)).at[orig_tbl].set(
        dtable.reshape(-1, 16), mode="drop", unique_indices=True)
    d_small = d_pairs[:N*SPAN_S].reshape(N, SPAN_S, 16).sum(1)
    d_large = d_pairs[N*SPAN_S:M].reshape(LCAP, SPAN_L, 16).sum(1)
    return jnp.sum(d_small[::7]) + jnp.sum(d_large[::7])
bench("scatter_set_unique + dense reduce", f_scatter_set, *scene)

# extra cost of carrying a payload through the bin sort
@jax.jit
def f_pairsort(*s):
    p = rz.project_gaussians(*s, T4, K, WIDTH, HEIGHT)
    key = (p.depth[:, None] * 1000).astype(jnp.uint32) + jnp.arange(SPAN_S, dtype=jnp.uint32)[None, :]
    key = jnp.broadcast_to(key, (N, SPAN_S)).reshape(-1)
    key = jnp.concatenate([key, key[:M - N*SPAN_S]])
    pos = jax.lax.iota(jnp.int32, M)
    ks, ps = jax.lax.sort((key, pos), num_keys=1)
    return jnp.sum(ks[::100000].astype(jnp.float32)) + jnp.sum(ps[::100000])
bench("pair sort w/ payload (M)", f_pairsort, *scene)

@jax.jit
def f_singlesort(*s):
    p = rz.project_gaussians(*s, T4, K, WIDTH, HEIGHT)
    key = (p.depth[:, None] * 1000).astype(jnp.uint32) + jnp.arange(SPAN_S, dtype=jnp.uint32)[None, :]
    key = jnp.broadcast_to(key, (N, SPAN_S)).reshape(-1)
    key = jnp.concatenate([key, key[:M - N*SPAN_S]])
    ks = jax.lax.sort((key,), num_keys=1)[0]
    return jnp.sum(ks[::100000].astype(jnp.float32))
bench("single sort (M)", f_singlesort, *scene)
