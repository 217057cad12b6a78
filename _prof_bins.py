import time, numpy as np, jax, jax.numpy as jnp
from pings_tpu.ops import rasterize as rz

WIDTH, HEIGHT = 1280, 720
N = 200_000
MPT = 512
rng = np.random.default_rng(0)
means = np.stack([rng.uniform(-12,12,N), rng.uniform(-7,7,N), rng.uniform(2,30,N)],-1).astype(np.float32)
quats = rng.normal(size=(N,4)).astype(np.float32); quats/=np.linalg.norm(quats,axis=-1,keepdims=True)
scales = rng.uniform(0.02,0.12,(N,3)).astype(np.float32)
opa = rng.uniform(0.2,0.95,N).astype(np.float32)
col = rng.uniform(0,1,(N,3)).astype(np.float32)
valid = np.ones(N,bool)
scene = tuple(jnp.asarray(x) for x in (means,quats,scales,opa,col,valid))
K = jnp.array([[900.,0,WIDTH/2],[0,900.,HEIGHT/2],[0,0,1.]])
T4 = jnp.eye(4)
tile, ntx, nty = 16, WIDTH//16, HEIGHT//16
T = ntx*nty
max_span, small_span, lcap = 36, 9, min(N, max(512, N//8))
rb = int(np.ceil(np.log2(N)))

def bench(name, fn, *args, iters=10):
    o = fn(*args); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(iters): o = fn(*args)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.2f} ms", flush=True)

def upto(stage):
    @jax.jit
    def f(*s):
        p = rz.project_gaussians(*s, T4, K, WIDTH, HEIGHT)
        acc = jnp.sum(p.radius)
        if stage == "project": return acc
        perm = jnp.argsort(p.depth).astype(jnp.int32)
        rank = jnp.zeros((N,), jnp.int32).at[perm].set(jnp.arange(N, dtype=jnp.int32))
        acc = acc + jnp.sum(rank[:5])
        if stage == "rank": return acc
        is_large = p.valid & (p.radius > 16.0)
        idx_l = jnp.nonzero(is_large, size=lcap, fill_value=N)[0]
        sel = idx_l < N
        in_large = jnp.zeros((N+1,), bool).at[idx_l].set(sel)[:N]
        acc = acc + jnp.sum(idx_l[:5]) + jnp.sum(in_large[:5])
        if stage == "nonzero": return acc
        r_s = jnp.minimum(p.radius, 16.0)
        tx0, ty0, sx, sy = rz._tile_range(p.means2d, r_s, tile, ntx, nty)
        tiles_s = rz._enum_pairs(tx0, ty0, sx, sy, p.valid & ~in_large, small_span, ntx, T)
        key_s = (tiles_s.astype(jnp.uint32) << rb) | rank[:, None].astype(jnp.uint32)
        acc = acc + jnp.sum(key_s[:3,:])
        if stage == "enum_small": return acc
        idx_c = jnp.minimum(idx_l, N-1)
        m2d_l = p.means2d[idx_c]
        r_l = jnp.minimum(p.radius[idx_c], 40.0)
        tx0l, ty0l, sxl, syl = rz._tile_range(m2d_l, r_l, tile, ntx, nty)
        tiles_l = rz._enum_pairs(tx0l, ty0l, sxl, syl, sel, max_span, ntx, T)
        key_l = (tiles_l.astype(jnp.uint32) << rb) | rank[idx_c][:, None].astype(jnp.uint32)
        acc = acc + jnp.sum(key_l[:3,:])
        if stage == "enum_large": return acc
        key = jnp.concatenate([key_s.reshape(-1), key_l.reshape(-1)])
        key_sorted = jax.lax.sort((key,), num_keys=1)[0]
        acc = acc + jnp.sum(key_sorted[::100000])
        if stage == "sort": return acc
        bounds = (jnp.arange(T+1, dtype=jnp.uint32) << rb)
        starts = jnp.searchsorted(key_sorted, bounds, side="left").astype(jnp.int32)
        acc = acc + jnp.sum(starts[::100])
        if stage == "searchsorted": return acc
        rank_tbl = (rz._build_window_table(key_sorted, starts, T, MPT) & jnp.uint32(2**rb - 1)).astype(jnp.int32)
        acc = acc + jnp.sum(rank_tbl[::100, ::100])
        if stage == "window": return acc
        gidx = perm[jnp.minimum(rank_tbl, N-1)]
        return acc + jnp.sum(gidx[::100, ::100])
    return f

for st in ["project","rank","nonzero","enum_small","enum_large","sort","searchsorted","window","final"]:
    bench(st, upto(st), *scene)
