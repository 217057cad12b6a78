import time, numpy as np, jax, jax.numpy as jnp
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
scene = tuple(jnp.asarray(x) for x in (means,quats,scales,opa,col,np.ones(N,bool)))
K = jnp.array([[900.,0,WIDTH/2],[0,900.,HEIGHT/2],[0,0,1.]])
T = jnp.eye(4)

def bench(name, fn, *args, iters=10):
    o = fn(*args); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(iters): o = fn(*args)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.2f} ms", flush=True)

def loss_full(*s):
    out = rp.rasterize_pallas(*s, T, K, WIDTH, HEIGHT, max_per_tile=MPT)
    return jnp.sum(out.rgb) + jnp.sum(out.alpha)

for S in (128, 64, 32):
    rp.SUPER = S
    fwd = jax.jit(lambda *s: jnp.sum(rp.rasterize_pallas(*s, T, K, WIDTH, HEIGHT, max_per_tile=MPT).rgb))
    bench(f"fwd SUPER={S}", fwd, *scene)
    bench(f"grad SUPER={S}", jax.jit(jax.grad(loss_full, argnums=(0,1,2,3,4))), *scene)
