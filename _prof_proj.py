import time, numpy as np, jax, jax.numpy as jnp
from pings_tpu.ops import rasterize as rz

N = 200_000
WIDTH, HEIGHT = 1280, 720
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

def bench(name, fn, *args, iters=20):
    o = fn(*args); jax.block_until_ready(o)
    t0=time.perf_counter()
    for _ in range(iters): o = fn(*args)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.3f} ms", flush=True)

@jax.jit
def p_cam(m):
    t_cam = m @ T[:3,:3].T + T[:3,3]
    return jnp.sum(t_cam)
bench("cam_transform", p_cam, scene[0])

@jax.jit
def p_quat(q):
    q = q / jnp.sqrt(jnp.sum(q*q,axis=-1,keepdims=True)+1e-12)
    qw,qx,qy,qz = q[:,0],q[:,1],q[:,2],q[:,3]
    out = 0.
    for a in (qw*qx, qx*qy, qy*qz, qz*qw, qw*qw-qx*qx):
        out = out + jnp.sum(a)
    return out
bench("quat_math", p_quat, scene[1])

@jax.jit
def p_full(*s):
    p = rz.project_gaussians(*s, T, K, WIDTH, HEIGHT)
    return jax.tree.map(jnp.sum, p)
bench("project_full", p_full, *scene)

# stacked outputs only
@jax.jit
def p_nostack(*s):
    p = rz.project_gaussians(*s, T, K, WIDTH, HEIGHT)
    return jnp.sum(p.conic) + jnp.sum(p.radius) + jnp.sum(p.depth)
bench("project_scalars_only", p_nostack, *s if False else scene)
