import time, functools, numpy as np, jax, jax.numpy as jnp
from pings_tpu.ops import rasterize as rz
from pings_tpu.ops import raster_pallas as rp

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
T = jnp.eye(4)
ntx, nty = WIDTH//16, HEIGHT//16

def bench(name, fn, *args, iters=8):
    # fn(eps, *args) -> scalar; eps varies per call to defeat any caching;
    # float() forces host readback.
    float(fn(jnp.float32(0.0), *args))
    t0 = time.perf_counter()
    for i in range(iters):
        v = float(fn(jnp.float32((i + 1) * 1e-12), *args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1e3:.2f} ms  (v={v:.6g})", flush=True)

bench("calib_trivial", jax.jit(lambda e, x: jnp.sum(x) * 0 + e), scene[0])

p0 = jax.jit(functools.partial(rz.project_gaussians, width=WIDTH, height=HEIGHT))(*scene, T, K)
b0 = jax.jit(functools.partial(rz.bin_gaussians, width=WIDTH, height=HEIGHT, max_per_tile=MPT))(p0)
a16 = jax.jit(rp.gauss_attr_matrix)(p0)
attrs = jax.jit(rp._pack_table)(a16, b0)
out, trans = jax.jit(lambda a: rp._blend_fwd_call(a, ntx, nty, 16))(attrs)
g_out = jnp.ones_like(out); g_trans = jnp.ones_like(trans)
rho = jnp.sum(g_out*out, axis=1, keepdims=True)

bench("project", jax.jit(lambda e, *s: jnp.sum(rz.project_gaussians(s[0]+e, *s[1:], T, K, WIDTH, HEIGHT).conic)), *scene)
bench("bins_all", jax.jit(lambda e, *s: (lambda b: jnp.sum(b.gauss_idx)+jnp.sum(b.pair_loc)+e)(rz.bin_gaussians(rz.project_gaussians(s[0]+e, *s[1:], T, K, WIDTH, HEIGHT), WIDTH, HEIGHT, max_per_tile=MPT))), *scene)
bench("bins_noloc", jax.jit(lambda e, *s: (lambda b: jnp.sum(b.gauss_idx)+e)(rz.bin_gaussians(rz.project_gaussians(s[0]+e, *s[1:], T, K, WIDTH, HEIGHT), WIDTH, HEIGHT, max_per_tile=MPT))), *scene)
bench("fwd_kernel", jax.jit(lambda e, a: jnp.sum(rp._blend_fwd_call(a+e, ntx, nty, 16)[0])), attrs)
bench("bwd_kernel", jax.jit(lambda e, a, g, gt, r, tf: jnp.sum(rp._blend_bwd_call(a+e, g, gt, r, tf, ntx, nty, 16))), attrs, g_out, g_trans, rho, trans)
bench("unpack", jax.jit(lambda e, d, b: jnp.sum(rp._unpack_grads(d+e, b, N))), dtable if (dtable:=jax.jit(lambda a,g,gt,r,tf: rp._blend_bwd_call(a,g,gt,r,tf,ntx,nty,16))(attrs, g_out, g_trans, rho, trans)) is not None else None, b0)
bench("pack", jax.jit(lambda e, a, b: jnp.sum(rp._pack_table(a+e, b))), a16, b0)

M = N*36
pos = jnp.asarray(rng.permutation(M).astype(np.int32))
vals = jnp.arange(M, dtype=jnp.int32)
bench("scatter_perm_7.2M", jax.jit(lambda e, p, v: jnp.sum(jnp.zeros(M, jnp.float32).at[p].set(v.astype(jnp.float32)+e, unique_indices=True, mode="drop"))), pos, vals)
key = jnp.asarray(rng.integers(0, 1<<30, M).astype(np.int32))
bench("sort_7.2M_1key_i32val", jax.jit(lambda e, k, v: jnp.sum(jax.lax.sort((k, v), num_keys=1)[1]) + e), key, vals)
key2 = jnp.asarray(rng.integers(0, 1<<30, (MPT*3600)).astype(np.int32))
v2 = jnp.arange(MPT*3600, dtype=jnp.int32)
bench("sort_1.8M_1key", jax.jit(lambda e, k, v: jnp.sum(jax.lax.sort((k, v), num_keys=1)[1]) + e), key2, v2)
key3 = jnp.asarray(rng.integers(0, 1<<30, N).astype(np.int32))
v3 = jnp.arange(N, dtype=jnp.int32)
bench("sort_200k_1key", jax.jit(lambda e, k, v: jnp.sum(jax.lax.sort((k, v), num_keys=1)[1]) + e), key3, v3)
