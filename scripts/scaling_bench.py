"""Scaling benchmark: render + train throughput vs device count.

Measures, on meshes of 1/2/4/... devices (real chips, or the virtual CPU
mesh via XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu):

  - tile-sharded render throughput (Mpix/s)
  - gaussian-sharded render throughput (Mpix/s)
  - data-parallel gsdf train step throughput (Mpix/s over the camera batch)
  - SDF query throughput (rays/s equivalent: points queried per second)

Writes one JSON line per (metric, n_devices) and a final efficiency
summary {metric: eff_at_max_devices}. The BASELINE.json north star asks
for >= 80% scaling efficiency; on the virtual CPU mesh the numbers
measure *sharding overhead* (no real parallel hardware), so the gate for
CI is "the sharded program runs and matches the unsharded result", while
the efficiency summary is what the driver records on real multi-chip
hardware.

Usage: python scripts/scaling_bench.py [--devices 1,2,4,8] [--cpu]
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual 8-device CPU mesh")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_force_host_platform_device_count=8").strip()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from pings_tpu.mapping import gs_mapper
    from pings_tpu.mapping.campool import CamPool
    from pings_tpu.models import field, neural_points as npm, decoder as dec
    from pings_tpu.models.renderer import CamView
    from pings_tpu.models.spawn import gather_local_data
    from pings_tpu.parallel.mesh import (
        make_dp_train_step, make_gauss_sharded_train_step, make_mesh,
        render_gauss_sharded, render_sharded)
    from pings_tpu.config import Config

    W, H = args.width, args.height
    cfg = Config.load(overrides=dict(
        max_points=1 << 15, buffer_size=1 << 17, voxel_size_m=0.2,
        bs=4096, spawn_n_gaussian=8, max_gs_per_tile=256,
        max_local_points=1 << 13, geo_mlp_hidden_dim=64,
        color_mlp_hidden_dim=64, gaussian_mlp_hidden_dim=64,
        min_range=0.5, max_range=30.0))

    rng = np.random.default_rng(0)
    n_pts = 8192
    pts = np.stack([rng.uniform(-8, 8, n_pts), rng.uniform(-6, 6, n_pts),
                    rng.uniform(2, 20, n_pts)], -1).astype(np.float32)
    m = npm.init_map(cfg, jax.random.PRNGKey(0))
    decoders = dec.init_decoders(jax.random.PRNGKey(1), cfg)
    m = npm.insert_points(
        m, jnp.asarray(pts), jnp.asarray(rng.random((n_pts, 3)), jnp.float32),
        jnp.ones(n_pts, bool),
        jnp.tile(jnp.array([1.0, 0, 0, 0]), (n_pts, 1)),
        jnp.int32(0), jnp.zeros(16), jnp.float32(1e9))
    local = gather_local_data(m, m.valid_mask, cfg.max_local_points)
    K = jnp.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1.0]])
    cam = CamView(K=K, T_c_w=jnp.eye(4),
                  rgb=jnp.asarray(rng.random((H, W, 3)), jnp.float32),
                  depth=jnp.asarray(rng.random((H, W)) * 10, jnp.float32),
                  sky=jnp.zeros((H, W)), frame_id=jnp.int32(0))
    spawn_kwargs = dict(spawn_k=cfg.spawn_n_gaussian,
                        voxel_size=cfg.voxel_size_m,
                        max_range=cfg.max_range)
    qpts = jnp.asarray(rng.random((1 << 16, 3)) * 16 - 8, jnp.float32)
    sigma_scale = cfg.logistic_gaussian_ratio * cfg.sigma_sigmoid_m

    def timeit(fn, iters=args.iters, warmup=2):
        for _ in range(warmup):
            out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    results = {}
    dev_counts = [int(d) for d in args.devices.split(",")
                  if int(d) <= len(jax.devices())]
    for nd in dev_counts:
        mesh = make_mesh(nd)
        row = {}

        # tile-sharded render
        dt = timeit(lambda: render_sharded(
            mesh, local.positions, jnp.tile(jnp.array([1.0, 0, 0, 0]),
                                            (local.positions.shape[0], 1)),
            jnp.full((local.positions.shape[0], 3), 0.05),
            jnp.full((local.positions.shape[0],), 0.8),
            local.rgb, local.valid, jnp.eye(4), K, W, H,
            max_per_tile=cfg.max_gs_per_tile))
        row["render_tile_mpix_s"] = W * H / dt / 1e6

        # gaussian-sharded render (spawn sharded + all_gather)
        with mesh:
            dt = timeit(lambda: render_gauss_sharded(
                mesh, local, decoders, cam, W, H,
                spawn_kwargs=spawn_kwargs,
                max_per_tile=cfg.max_gs_per_tile))
        row["render_gauss_mpix_s"] = W * H / dt / 1e6

        # data-parallel train step: nd cameras, one per device
        cpool = CamPool(cfg)
        exposure, cam_delta = cpool.init_param_pools()
        opt = gs_mapper.make_gs_optimizer(cfg)
        cams = jax.tree.map(
            lambda x: jnp.stack([x] * nd), cam)
        local_idx = jnp.nonzero(m.valid_mask, size=cfg.max_local_points,
                                fill_value=m.capacity)[0]
        sdf_batch = (qpts[:cfg.bs], jnp.zeros(cfg.bs),
                     jnp.zeros((cfg.bs, 3)), jnp.ones(cfg.bs),
                     jnp.ones(cfg.bs, bool))
        step = make_dp_train_step(cfg, opt, mesh, W, H,
                                  cfg.max_local_points)
        cam_slots = jnp.arange(nd, dtype=jnp.int32) % exposure.a.shape[0]

        def run_step():
            # copy: the step donates params/state and gs_params aliases
            # the map/pool buffers
            params = jax.tree.map(jnp.copy, gs_mapper.gs_params(
                m, decoders, exposure, cam_delta))
            state = opt.init(params)
            with mesh:
                return step(params, state, m, decoders, local_idx, cams,
                            cam_slots, sdf_batch, jnp.asarray(False))[2]

        # time only repeated steps with pre-built params (donation-safe:
        # rebuild params per call is host-cheap, jit reuses the executable)
        dt = timeit(run_step, iters=max(2, args.iters // 2))
        row["train_dp_mpix_s"] = nd * W * H / dt / 1e6

        # gaussian-sharded TRAINING step (model parallel: one camera, the
        # spawn/projection sharded over points; bwd reduce-scatters the
        # projected-attribute grads)
        gstep = make_gauss_sharded_train_step(cfg, opt, mesh, W, H,
                                              cfg.max_local_points)

        def run_gauss_step():
            params = jax.tree.map(jnp.copy, gs_mapper.gs_params(
                m, decoders, exposure, cam_delta))
            state = opt.init(params)
            with mesh:
                return gstep(params, state, m, decoders, local_idx, cam)[2]

        dt = timeit(run_gauss_step, iters=max(2, args.iters // 2))
        row["train_gauss_mpix_s"] = W * H / dt / 1e6

        # SDF query rays/s (batch sharded over the mesh)
        shard = NamedSharding(mesh, P(mesh.axis_names[0]))
        q_sh = jax.device_put(qpts, shard)

        @jax.jit
        def sdf_query(q):
            return field.sdf_at(m, decoders, q, sigma_scale,
                                cfg.query_nn_k, cfg.num_nei_cells,
                                cfg.search_alpha)[0]

        dt = timeit(lambda: sdf_query(q_sh))
        row["sdf_query_rays_s"] = qpts.shape[0] / dt

        results[nd] = row
        for k, v in row.items():
            print(json.dumps({"metric": k, "n_devices": nd,
                              "value": round(v, 2)}), flush=True)

    base = results[dev_counts[0]]
    eff = {}
    nd_max = dev_counts[-1]
    for k in base:
        scale = results[nd_max][k] / base[k]
        eff[k] = round(scale / (nd_max / dev_counts[0]), 3)
    print(json.dumps({"metric": "scaling_efficiency",
                      "n_devices": nd_max, "per_metric": eff}))


if __name__ == "__main__":
    main()
