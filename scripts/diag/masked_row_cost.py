#!/usr/bin/env python3
"""Does masking table slots make pack/unpack/blend cheaper?

If a (T,Kmax) table whose tail slots are masked (index -> dump row) packs
and unpacks significantly faster than a fully-live table, then
saturation-aware truncation at bin time (conservative per-tile
transmittance bound) is an honest speed lever at ~1e-4 rgb error;
otherwise only a smaller static Kmax helps and it costs quality."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np, jax, jax.numpy as jnp
import bench
from pings_tpu.ops import raster_pallas as rp
from pings_tpu.ops.rasterize import bin_gaussians, project_gaussians, TileBins

rng = np.random.default_rng(0)
scene = bench.make_scene(rng, bench.N_GAUSS)
K = jnp.array([[900.0, 0, bench.WIDTH/2], [0, 900.0, bench.HEIGHT/2], [0,0,1.0]])
T = jnp.eye(4)
tile=16; ntx=(bench.WIDTH+15)//16; nty=(bench.HEIGHT+15)//16
p = jax.jit(lambda *s: project_gaussians(*s, T, K, bench.WIDTH, bench.HEIGHT))(*scene)
bins = jax.jit(lambda p: bin_gaussians(p, bench.WIDTH, bench.HEIGHT, tile=tile,
                                       max_per_tile=128))(p)
attr16 = jax.jit(rp.gauss_attr_matrix)(p)

def timeit(fn, *a, it=10):
    for _ in range(3): out = fn(*a)
    jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(it): out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/it*1e3

def variant(keep):
    """mask all but the first `keep` slots per tile."""
    slot = jnp.arange(128)[None, :]
    live = slot < keep
    mask = bins.mask & live
    tbl = jnp.where(mask, bins.gauss_tbl, bench.N_GAUSS)  # dump row
    counts = jnp.minimum(bins.counts, keep)
    return TileBins(gauss_tbl=tbl, mask=mask, counts=counts,
                    n_overflow=bins.n_overflow)

packf = jax.jit(rp._pack_table)
for keep in (128, 64, 32):
    b = variant(keep)
    attrs = packf(attr16, b)
    t_pack = timeit(packf, attr16, b)
    fwd = jax.jit(lambda a, c: rp._blend_fwd_call(a, c, ntx, nty, tile, 128,
                                                  "3dgs", True))
    out, trans, _ = fwd(attrs, b.counts)
    t_fwd = timeit(fwd, attrs, b.counts)
    g_out = jnp.ones_like(out); g_trans = jnp.ones_like(trans)
    rho = jnp.sum(g_out*out, axis=1, keepdims=True)
    bwd = jax.jit(lambda a,c,g,gt,r,tf: rp._blend_bwd_call(a,c,g,gt,r,tf,
        ntx, nty, tile, 128, "3dgs", True))
    dt_ = bwd(attrs, b.counts, g_out, g_trans, rho, trans)
    t_bwd = timeit(bwd, attrs, b.counts, g_out, g_trans, rho, trans)
    unpack = jax.jit(lambda d, bb: rp._unpack_grads(d, bb, bench.N_GAUSS))
    _ = unpack(dt_, b)
    t_un = timeit(unpack, dt_, b)
    print(f"keep={keep:3d} pack={t_pack:6.2f} fwd={t_fwd:6.2f} "
          f"bwd={t_bwd:6.2f} unpack={t_un:6.2f} ms", flush=True)
