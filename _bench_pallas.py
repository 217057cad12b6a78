import time, numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices())
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
tgt = jnp.asarray(rng.random((HEIGHT,WIDTH,3)),jnp.float32)
z3 = jnp.zeros(3)

def mkloss(raster, extra):
    def loss(ms,qs,sc,op,cl,vd,th,rh):
        out = raster(ms,qs,sc,op,cl,vd,T,K,WIDTH,HEIGHT,theta=th,rho=rh,max_per_tile=MPT,**extra)
        return jnp.mean(jnp.abs(out.rgb-tgt)) + 0.01*jnp.mean(out.depth*out.alpha) + 0.01*jnp.mean(out.alpha)
    return loss

for name, raster, extra in [("pallas", rp.rasterize_pallas, {}), ("xla", rz.rasterize, dict(chunk=32))]:
    fwd = jax.jit(mkloss(raster, extra))
    grad_fn = jax.jit(jax.grad(mkloss(raster, extra), argnums=(0,1,2,3,4,6,7)))
    try:
        t0=time.perf_counter(); v = fwd(*scene, z3, z3); jax.block_until_ready(v)
        print(f"{name} fwd compile {time.perf_counter()-t0:.1f}s loss={v:.4f}")
        t0=time.perf_counter()
        for _ in range(10): v = fwd(*scene, z3, z3)
        jax.block_until_ready(v); dtf=(time.perf_counter()-t0)/10
        t0=time.perf_counter(); g = grad_fn(*scene, z3, z3); jax.block_until_ready(g)
        print(f"{name} bwd compile {time.perf_counter()-t0:.1f}s")
        t0=time.perf_counter()
        for _ in range(10): g = grad_fn(*scene, z3, z3)
        jax.block_until_ready(g); dtg=(time.perf_counter()-t0)/10
        mp = WIDTH*HEIGHT/1e6
        print(f"{name}: fwd {dtf*1e3:.1f} ms ({mp/dtf:.1f} Mpix/s), fwd+bwd {dtg*1e3:.1f} ms ({mp/dtg:.1f} Mpix/s)")
        print(f"{name} grad norms:", [float(jnp.linalg.norm(x)) for x in g])
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:2000]}")
