#!/usr/bin/env python3
"""Diagnose the kitti_synth tracker slide: train the map for N frames with
GT poses (no tracker), then (a) measure the learned SDF at KNOWN true
surfaces (ground plane z=0), (b) run one tracker solve on the NEXT frame
initialized at its GT pose — the converged delta from GT is the
registration bias directly.

A systematic SDF zero-crossing offset toward the sensor would explain
both the early forward lag (~0.22 m/frame) and the +z climb of the
round-3 diverged run."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np
import jax.numpy as jnp

from pings_tpu.config import Config
from pings_tpu.data.base import dataset_factory
from pings_tpu.data.frame import preprocess_frame
from pings_tpu.slam.pipeline import SlamSystem
from pings_tpu.odometry.tracker import Tracker
from pings_tpu.models import field
from pings_tpu.utils import pose as hp

N_FRAMES = int(os.environ.get("N_FRAMES", "20"))
GS = os.environ.get("GS", "1") == "1"

overrides = dict(track_on=False, gs_on=GS, pgo_on=False)
if os.environ.get("FREE_BEHIND") is not None:
    overrides["free_behind_n"] = int(os.environ["FREE_BEHIND"])
if os.environ.get("SSR") is not None:
    overrides["surface_sample_range_m"] = float(os.environ["SSR"])
if os.environ.get("INC") is not None:
    overrides["incidence_weight_on"] = os.environ["INC"] == "1"
cfg = Config.load("configs/kitti_synth.yaml", overrides)
ds = dataset_factory("kitti", "data_validation/kitti_synth", "00", cfg)
system = SlamSystem(cfg)
t0 = time.time()
for i in range(N_FRAMES):
    tf = time.time()
    rep = system.process_frame(ds[i])
    stages = " ".join(f"{k}:{v:.2f}" for k, v in rep.timings.items())
    print(f"frame {i} [{time.time()-tf:.1f}s {stages}] pts={rep.n_points} "
          + " ".join(f"{k}={v:.3f}" for k, v in rep.metrics.items()),
          flush=True)
print(f"trained {N_FRAMES} frames in {time.time()-t0:.0f}s", flush=True)

cfgq = dict(k=cfg.query_nn_k, stencil_r=cfg.num_nei_cells,
            search_alpha=cfg.search_alpha)
sigma = cfg.logistic_gaussian_ratio * cfg.sigma_sigmoid_m
pos = system.poses[-1][:3, 3]

rng = np.random.default_rng(0)
gx = pos[0] + rng.uniform(-8, 8, 4096)
gy = pos[1] + rng.uniform(-6, 6, 4096)
ground = np.stack([gx, gy, np.zeros_like(gx)], -1).astype(np.float32)

def probe(name, pts):
    sdf, grad, std, valid = field.sdf_grad_analytical(
        system.m, system.decoders, jnp.asarray(pts), sigma, **cfgq)
    v = np.asarray(valid)
    sdf = np.asarray(sdf)[v]
    g = np.asarray(grad)[v]
    print(f"{name}: n={len(sdf)} sdf mean={sdf.mean():+.4f} "
          f"med={np.median(sdf):+.4f} std={sdf.std():.4f} "
          f"gradz_mean={g[:,2].mean():+.3f} "
          f"|grad|={np.linalg.norm(g, axis=1).mean():.3f}", flush=True)

probe("ground(z=0)  ", ground)
probe("above(z=0.3) ", ground + np.array([0, 0, 0.3], np.float32))
probe("below(z=-0.3)", ground - np.array([0, 0, 0.3], np.float32))

# (b) tracker solve on the next frame from a PERFECT init
tracker = Tracker(cfg)
fr = ds[N_FRAMES]
T_gt = fr["gt_pose"]
T_rel_gt = hp.se3_inv(system.poses[-1]) @ T_gt
pre = preprocess_frame(fr, cfg, T_rel_gt, cfg.deskew)
for name, T0 in (("init=GT", T_gt),
                 ("init=const-vel", system.poses[-1] @ T_rel_gt)):
    res = tracker.track(system.m, system.decoders, pre.source_points,
                        pre.source_mask, T0)
    d = hp.se3_inv(T_gt) @ res.T_w_l
    print(f"track[{name}]: valid={res.valid} degen={res.degenerate} "
          f"iters={res.iterations} res={res.mean_res:.4f} "
          f"ratio={res.valid_ratio:.2f} "
          f"dT=({d[0,3]:+.3f},{d[1,3]:+.3f},{d[2,3]:+.3f}) "
          f"rot={hp.rotation_angle_deg(d[:3,:3]):.3f}deg", flush=True)
