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

@jax.jit
def triv(x):
    return x + 1.0
bench("trivial_add", triv, scene[0])

@jax.jit
def f1(*s):
    p = rz.project_gaussians(*s, T, K, WIDTH, HEIGHT)
    return jax.tree.map(jnp.sum, p)
bench("e2e_project_sum", f1, *scene)

@jax.jit
def f2(*s):
    p = rz.project_gaussians(*s, T, K, WIDTH, HEIGHT)
    b = rz.bin_gaussians(p, WIDTH, HEIGHT, max_per_tile=MPT)
    return jnp.sum(b.rank_tbl), jnp.sum(b.mask)
bench("e2e_bins_sum", f2, *scene)

@jax.jit
def f3(*s):
    p = rz.project_gaussians(*s, T, K, WIDTH, HEIGHT)
    b = rz.bin_gaussians(p, WIDTH, HEIGHT, max_per_tile=MPT)
    a = rp._pack_table(rp.gauss_attr_matrix(p), b)
    return jnp.sum(a)
bench("e2e_packed_sum", f3, *scene)

@jax.jit
def f4(*s):
    p = rz.project_gaussians(*s, T, K, WIDTH, HEIGHT)
    b = rz.bin_gaussians(p, WIDTH, HEIGHT, max_per_tile=MPT)
    a = rp._pack_table(rp.gauss_attr_matrix(p), b)
    out, trans = rp._blend_fwd_call(a, b.counts, ntx, nty, 16)
    return jnp.sum(out) + jnp.sum(trans)
bench("e2e_blend_sum", f4, *scene)

fullf = jax.jit(lambda *s: jnp.sum(rp.rasterize_pallas(*s, T, K, WIDTH, HEIGHT, max_per_tile=MPT).rgb))
bench("e2e_full_sum", fullf, *scene)

# grad decomposition (e2e from scene so timings are trustworthy)
def loss_full(*s):
    out = rp.rasterize_pallas(*s, T, K, WIDTH, HEIGHT, max_per_tile=MPT)
    return jnp.sum(out.rgb) + jnp.sum(out.alpha)
bench("e2e_full_grad", jax.jit(jax.grad(loss_full, argnums=(0,1,2,3,4))), *scene)

def loss_proj(*s):
    p = rz.project_gaussians(*s, T, K, WIDTH, HEIGHT)
    a = rp.gauss_attr_matrix(p)
    return jnp.sum(a * a)
bench("grad_project_only", jax.jit(jax.grad(loss_proj, argnums=(0,1,2,3,4))), *scene)
