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

def bench(name, fn, *args, iters=10):
    o = fn(*args); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(iters): o = fn(*args)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.2f} ms", flush=True)
    return o

p0 = jax.jit(functools.partial(rz.project_gaussians, width=WIDTH, height=HEIGHT))(*scene, T, K)
b0 = jax.jit(functools.partial(rz.bin_gaussians, width=WIDTH, height=HEIGHT, max_per_tile=MPT))(p0)
a16 = jax.jit(rp.gauss_attr_matrix)(p0)
attrs = jax.jit(rp._pack_table)(a16, b0)
out, trans = jax.jit(lambda a: rp._blend_fwd_call(a, ntx, nty, 16))(attrs)
jax.block_until_ready((p0,b0,a16,attrs,out,trans))
g_out = jnp.ones_like(out); g_trans = jnp.ones_like(trans)
rho = jnp.sum(g_out*out, axis=1, keepdims=True)

fwdk = jax.jit(lambda a: jnp.sum(rp._blend_fwd_call(a, ntx, nty, 16)[0]))
bench("fwd_kernel_sum", fwdk, attrs)

bwdk = jax.jit(lambda a,g,gt,r,tf: jnp.sum(rp._blend_bwd_call(a,g,gt,r,tf,ntx,nty,16)))
bench("bwd_kernel_sum", bwdk, attrs, g_out, g_trans, rho, trans)

dtable = jax.jit(lambda a,g,gt,r,tf: rp._blend_bwd_call(a,g,gt,r,tf,ntx,nty,16))(attrs, g_out, g_trans, rho, trans)
jax.block_until_ready(dtable)
unp = jax.jit(lambda d,b: jnp.sum(rp._unpack_grads(d,b,N)))
bench("unpack_sum", unp, dtable, b0)

pk = jax.jit(lambda a,b: jnp.sum(rp._pack_table(a,b)))
bench("pack_sum", pk, a16, b0)

# vjp of pack via pair_loc gather vs autodiff scatter
packvjp = jax.vjp(lambda a: rp._pack_table(a, b0), a16)[1]
bench("pack_autodiff_vjp_sum", jax.jit(lambda d: jnp.sum(packvjp(d)[0])), dtable)

# scatter-based unsort (alternative to second sort in bin_gaussians)
M = N*36
pos = jnp.asarray(rng.permutation(M).astype(np.int32))
vals = jnp.arange(M, dtype=jnp.int32)
def scat(pos, vals):
    return jnp.sum(jnp.zeros(M, jnp.int32).at[pos].set(vals, unique_indices=True, mode="drop"))
bench("scatter_perm_7.2M", jax.jit(scat), pos, vals)

key = jnp.asarray(rng.integers(0, 1<<30, M).astype(np.int32))
bench("sort1key_7.2M", jax.jit(lambda k: jnp.sum(jax.lax.sort((k, vals), num_keys=1)[1])), key)
key2 = jnp.asarray(rng.integers(0, 1<<30, (MPT*3600)).astype(np.int32))
v2 = jnp.arange(MPT*3600, dtype=jnp.int32)
bench("sort1key_1.8M", jax.jit(lambda k: jnp.sum(jax.lax.sort((k, v2), num_keys=1)[1])), key2)
