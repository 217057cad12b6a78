"""In-context stage costing by the slope method.

Direct per-dispatch timing through the axon tunnel is unreliable (it
under-reports ~100x until the first heavy compile in the process flips
it to real synchronization), so every stage is measured as M in-jit
fori_loop iterations with a chained data dependency, host-synced, and
the per-iteration cost is the slope (t_M6 - t_M1)/5.

r5 numbers (v5e, bench scene, Kmax=128, fast, cached bins),
BEFORE the hs excl-prod swap:
  fwd kernel                ~1.5 ms (noise-limited)
  fwd+bwd kernels            5.02 ms
  attr grad (pack..unpack)  11.06 ms   -> bookends+assemble+loss ~6.0
  FULL grad step            17.25 ms   -> project+attr (+AD)     ~6.2
"""
import time, sys
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
from bench import HEIGHT, MAX_PER_TILE, SUPERBLOCK, WIDTH, make_scene
from pings_tpu.ops import raster_pallas as rp
from pings_tpu.ops.rasterize import bin_gaussians, project_gaussians

N=200_000; FAST=True; tile=16
ntx=(WIDTH+tile-1)//tile; nty=(HEIGHT+tile-1)//tile
rng=np.random.default_rng(0)
scene=make_scene(rng,N)
K=jnp.array([[900.0,0,WIDTH/2],[0,900.0,HEIGHT/2],[0,0,1.0]])
T4=jnp.eye(4)
p=jax.jit(lambda *s: project_gaussians(*s,T4,K,WIDTH,HEIGHT))(*scene)
bins=jax.jit(lambda p: bin_gaussians(p,WIDTH,HEIGHT,tile=tile,max_per_tile=MAX_PER_TILE))(p)
attr16=jax.jit(rp.gauss_attr_matrix)(p)
packed=jax.jit(rp._pack_table)(attr16,bins)
tgt=jnp.asarray(rng.random((HEIGHT,WIDTH,3)),jnp.float32)

def slope(make_body, carry0, name, Ms=(1,6)):
    times={}
    for M in Ms:
        @jax.jit
        def run(c0):
            def body(i, c):
                return make_body(c)
            return jax.lax.fori_loop(0, M, body, c0)
        out=run(carry0)
        jax.block_until_ready(out)
        # force real sync via host-get of a scalar derived from out
        leaves=jax.tree_util.tree_leaves(out)
        float(leaves[0].ravel()[0])
        t0=time.perf_counter()
        for _ in range(4):
            out=run(carry0)
            leaves=jax.tree_util.tree_leaves(out)
            float(leaves[0].ravel()[0])
        times[M]=(time.perf_counter()-t0)/4*1e3
    per=(times[Ms[1]]-times[Ms[0]])/(Ms[1]-Ms[0])
    print(f"{name:24s} {per:7.2f} ms/iter   (M{Ms[0]} {times[Ms[0]]:.1f}  M{Ms[1]} {times[Ms[1]]:.1f})")
    return per

# 1. real fwd kernel only
def fwd_body(c):
    a, s = c
    out, trans, _ = rp._blend_fwd_call(a, bins.counts, ntx, nty, tile, SUPERBLOCK, "3dgs", FAST)
    s = s + out[0,0,0] + trans[0,0,0]
    return a + s*1e-30, s
slope(fwd_body, (packed, jnp.float32(0)), "fwd kernel")

# 2. real fwd+bwd
def fb_body(c):
    a, s = c
    out, trans, _ = rp._blend_fwd_call(a, bins.counts, ntx, nty, tile, SUPERBLOCK, "3dgs", FAST)
    g_out=jnp.ones_like(out); g_trans=jnp.ones_like(trans)
    rho=jnp.sum(g_out*out,axis=1,keepdims=True)
    dt = rp._blend_bwd_call(a, bins.counts, g_out, g_trans, rho, trans, ntx, nty, tile, SUPERBLOCK, "3dgs", FAST)
    s = s + dt[0,0,0]
    return a + s*1e-30, s
slope(fb_body, (packed, jnp.float32(0)), "fwd+bwd kernels")

# 3. full attr-grad chain: pack -> kernels -> unpack
def lossv(out, trans):
    rgb, depth, alpha, normal, _ = rp.assemble_blend(out, trans, jnp.zeros_like(trans), jnp.zeros(3), WIDTH, HEIGHT, tile, "3dgs", True)
    return jnp.mean(jnp.abs(rgb-tgt)) + 0.01*jnp.mean(depth*alpha)+0.01*jnp.mean(alpha)
def attr_loss(a16):
    out, trans, _ = rp._blend_gaussians(a16, bins, None, ntx, nty, tile, SUPERBLOCK, "3dgs", FAST)
    return lossv(out, trans)
ga = jax.grad(attr_loss)
def attr_body(c):
    a16, s = c
    g = ga(a16)
    s = s + g[0,0]
    return a16 + s*1e-30, s
slope(attr_body, (attr16, jnp.float32(0)), "attr grad (pack..unpack)")

# 4. full shipping grad step
def full_loss(means,quats,scales,opa,col,valid,theta,rho):
    out = rp.rasterize_pallas(means,quats,scales,opa,col,valid,T4,K,WIDTH,HEIGHT,theta=theta,rho=rho,max_per_tile=MAX_PER_TILE,superblock=SUPERBLOCK,precision="fast",bins=bins)
    return jnp.mean(jnp.abs(out.rgb-tgt))+0.01*jnp.mean(out.depth*out.alpha)+0.01*jnp.mean(out.alpha)
gf = jax.grad(full_loss, argnums=(0,1,2,3,4,6,7))
z3=jnp.zeros(3)
def full_body(c):
    means, s = c
    g = gf(means, *scene[1:], z3, z3)
    s = s + g[0][0,0]
    return means + s*1e-30, s
slope(full_body, (scene[0], jnp.float32(0)), "FULL grad step")
