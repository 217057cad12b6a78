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

def bench(name, fn, *args, iters=10):
    o = fn(*args); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(iters): o = fn(*args)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.2f} ms")
    return o

proj = jax.jit(functools.partial(rz.project_gaussians, width=WIDTH, height=HEIGHT))
p = bench("project", proj, *scene, T, K)

binf = jax.jit(functools.partial(rz.bin_gaussians, width=WIDTH, height=HEIGHT, max_per_tile=MPT))
bins = bench("bin", binf, p)

attrf = jax.jit(rp.gauss_attr_matrix)
attr16 = bench("attr_matrix", attrf, p)

packf = jax.jit(rp._pack_table)
attrs = bench("pack_table", packf, attr16, bins)

ntx = WIDTH//16; nty = HEIGHT//16
blendf = jax.jit(lambda a: rp._blend_fwd_call(a, ntx, nty, 16))
out, trans = bench("pallas_blend_fwd", blendf, attrs)

g_out = jnp.ones_like(out); g_trans = jnp.ones_like(trans)
rho = jnp.sum(g_out*out, axis=1, keepdims=True)
bwdf = jax.jit(lambda a,g,gt,r,tf: rp._blend_bwd_call(a,g,gt,r,tf,ntx,nty,16))
dtable = bench("pallas_blend_bwd", bwdf, attrs, g_out, g_trans, rho, trans)

unpackf = jax.jit(lambda d,b: rp._unpack_grads(d,b,N))
bench("unpack_grads", unpackf, dtable, bins)

# vjp of pack_table alone (gather -> scatter-add in autodiff? no, we use custom)
# full fwd via pallas
fullf = jax.jit(lambda *s: rp.rasterize_pallas(*s, T, K, WIDTH, HEIGHT, max_per_tile=MPT).rgb)
bench("full_fwd", fullf, *scene)

# vjp through project only
def proj_loss(*s):
    p = rz.project_gaussians(*s, T, K, WIDTH, HEIGHT)
    a = rp.gauss_attr_matrix(p)
    return jnp.sum(a*a)
bench("project_fwdbwd", jax.jit(jax.grad(proj_loss, argnums=(0,1,2,3,4))), *scene)

print("overflow:", int(bins.n_overflow))
import collections
cnt = np.asarray(jnp.sum(bins.mask,axis=1))
print("per-tile count: mean", cnt.mean(), "max", cnt.max(), "p99", np.percentile(cnt,99))
