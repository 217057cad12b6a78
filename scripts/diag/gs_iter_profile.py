#!/usr/bin/env python3
"""Where does a GS training iteration go at replica scale?
600x340 render, 64k local points x4 spawn, full gsdf step with bins
reuse — pipelined (async submit, single sync) like the real loop."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np
import jax, jax.numpy as jnp

from pings_tpu.config import Config
from pings_tpu.mapping import gs_mapper, pool as rp
from pings_tpu.mapping.campool import CamPool
from pings_tpu.mapping.sampler import sample_rays_cfg
from pings_tpu.models import decoder as dec, neural_points as npm
from pings_tpu.models.renderer import CamView

cfg = Config.load("configs/replica_synth.yaml")
cfg.pc_path = ""
key = jax.random.PRNGKey(0)
m = npm.init_map(cfg, key)
decoders = dec.init_decoders(jax.random.PRNGKey(1), cfg)
rng = np.random.default_rng(0)
n = 60000
pts = np.stack([rng.uniform(-5,5,n), rng.uniform(-4,4,n),
                rng.uniform(0,3,n)], -1).astype(np.float32)
m = npm.insert_points(m, jnp.asarray(pts), jnp.asarray(rng.random((n,3)), jnp.float32),
    jnp.ones(n,bool), jnp.tile(jnp.array([1.0,0,0,0]),(n,1)), jnp.int32(0),
    jnp.zeros(1000), jnp.float32(1e9))
pool = rp.init_pool(cfg.pool_capacity)
s = sample_rays_cfg(jax.random.PRNGKey(2), jnp.asarray(pts),
                    jnp.asarray(rng.random((n,3)), jnp.float32),
                    jnp.ones(n,bool), jnp.zeros(3), cfg)
pool = rp.pool_insert(pool, s, jnp.int32(0), jax.random.PRNGKey(3))

W, H = 600, 340
cam = CamView(K=jnp.array([[300.0,0,W/2],[0,300.0,H/2],[0,0,1.0]]),
              T_c_w=jnp.asarray(np.linalg.inv(
                  np.array([[0.,0,1,-6],[-1,0,0,0],[0,-1,0,1.5],[0,0,0,1]])), jnp.float32),
              rgb=jnp.asarray(rng.random((H,W,3)),jnp.float32),
              depth=jnp.asarray(rng.random((H,W))*8,jnp.float32),
              sky=jnp.zeros((H,W)), frame_id=jnp.int32(0))
cpool = CamPool(cfg)
exposure, cam_delta = cpool.init_param_pools()
opt = gs_mapper.make_gs_optimizer(cfg)
params = gs_mapper.gs_params(m, decoders, exposure, cam_delta)
state = opt.init(params)
L = cfg.max_local_points
local_idx = jnp.nonzero(m.valid_mask, size=L, fill_value=m.capacity)[0]
step = gs_mapper.make_gsdf_step(cfg, opt, W, H, L)
slot = jnp.int32(0)
freeze = jnp.asarray(False)
keys = jax.random.split(jax.random.PRNGKey(9), 64)

def run(n_iters, use_bins_cache=True):
    global params, state
    ent = None
    t0 = time.perf_counter()
    for i in range(n_iters):
        ub = use_bins_cache and ent is not None and ent["uses"] < cfg.raster_rebin_every
        params, state, met, (bins_out, means2d, contrib) = step(
            params, state, m, decoders, local_idx, cam, slot,
            (pool, keys[i % 64]), freeze,
            bins=ent["bins"] if ub else None,
            bin_means=ent["means"] if ub else None,
            cached_contrib=ent["contrib"] if ub else None,
            use_bins=ub, draw_batch=True)
        if ub: ent["uses"] += 1; ent["bins"], ent["means"] = bins_out, means2d
        elif bins_out is not None:
            ent = {"bins": bins_out, "means": means2d, "contrib": contrib, "uses": 1}
    jax.block_until_ready(met.total)
    return (time.perf_counter() - t0) / n_iters * 1e3

run(3)  # warmup/compile (both variants)
run(2, use_bins_cache=False)
t_cached = run(24)
t_fresh = run(8, use_bins_cache=False)
print(f"gs iter (bins reuse): {t_cached:6.1f} ms", flush=True)
print(f"gs iter (rebin each): {t_fresh:6.1f} ms", flush=True)
