"""Offline map inspector — load a saved run and re-render / eval / mesh.

TPU-native counterpart of the reference ``inspect_pings.py`` (999 LoC,
``inspect_pings_map`` :79-104): loads the map checkpoint + decoders from
a run directory, re-creates the local map around a chosen frame, renders
along the saved (or a given) trajectory into PNGs / an MP4, evaluates
held-out views (PSNR/SSIM/depth-L1, reference mapper.gs_eval_offline,
mapper.py:1691-2211), reconstructs the mesh (``--recon-3d``), exports
SDF slices, and dumps the neural point cloud with several color modes.

Usage:
    python -m pings_tpu.inspect_map RUN_DIR [--frame N] [--render]
        [--recon-3d] [--sdf-slice H] [--export-points MODE]
        [--eval --loader L --data-path P --seq S] [--video out.mp4]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np

from pings_tpu.config import Config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="pings_tpu.inspect_map",
        description="Inspect a saved pings_tpu map checkpoint")
    p.add_argument("run_dir", help="run directory (contains model/pin_map.npz)")
    p.add_argument("--frame", "-f", type=int, default=-1,
                   help="center frame for the local map (-1 = last)")
    p.add_argument("--render", action="store_true",
                   help="re-render the saved trajectory to PNGs")
    p.add_argument("--poses", default=None,
                   help="render with poses from this KITTI-format file "
                        "instead of the saved trajectory")
    p.add_argument("--stride", type=int, default=1)
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=240)
    p.add_argument("--fx", type=float, default=300.0)
    p.add_argument("--video", default=None, help="write an mp4 instead of PNGs")
    p.add_argument("--recon-3d", action="store_true", help="marching-cubes mesh")
    p.add_argument("--mc-res", type=float, default=None)
    p.add_argument("--sdf-slice", type=float, default=None,
                   metavar="HEIGHT", help="write a horizontal SDF slice npy")
    p.add_argument("--export-points", default=None,
                   choices=["rgb", "height", "time", "certainty"],
                   help="dump the neural point cloud as .ply colored by MODE")
    p.add_argument("--eval", action="store_true",
                   help="held-out NVS eval against dataset frames")
    p.add_argument("--loader", default=None)
    p.add_argument("--data-path", default="")
    p.add_argument("--seq", default=None)
    p.add_argument("--eval-every", type=int, default=5,
                   help="use every Nth frame as a test view")
    p.add_argument("--cam-refine", action="store_true",
                   help="force per-view camera refinement before eval "
                        "(sets gs_eval_cam_refine_on; the reference "
                        "refine loop, mapper.py:1774-1860 — required "
                        "for NVS eval along an ESTIMATED trajectory)")
    p.add_argument("--out", default=None, help="output dir (default RUN_DIR/inspect)")
    return p


def load_system(run_dir: str):
    from pings_tpu.slam.pipeline import SlamSystem

    cfg_file = os.path.join(run_dir, "config_all.yaml")
    cfg = Config.load(cfg_file) if os.path.exists(cfg_file) else Config()
    cfg.silence = True
    system = SlamSystem(cfg)
    ckpt = os.path.join(run_dir, "model", "pin_map.npz")
    if not os.path.exists(ckpt):
        cands = glob.glob(os.path.join(run_dir, "**", "pin_map.npz"),
                          recursive=True)
        if not cands:
            raise FileNotFoundError(f"no pin_map.npz under {run_dir}")
        ckpt = cands[0]
    system.load(ckpt)
    return cfg, system


def _camera(args, T_w_c: np.ndarray):
    import jax.numpy as jnp

    from pings_tpu.models.renderer import CamView

    K = np.array([[args.fx, 0, args.width / 2],
                  [0, args.fx, args.height / 2], [0, 0, 1.0]])
    T_c_w = np.linalg.inv(T_w_c)
    z = jnp.zeros((args.height, args.width))
    return CamView(K=jnp.asarray(K, jnp.float32),
                   T_c_w=jnp.asarray(T_c_w, jnp.float32),
                   rgb=jnp.zeros((args.height, args.width, 3)),
                   depth=z, sky=z, frame_id=jnp.int32(0))


def _local_data(cfg, system, center: np.ndarray):
    import jax.numpy as jnp

    from pings_tpu.models import neural_points as npm
    from pings_tpu.models.spawn import gather_local_data

    # offline: pure spatial mask (no travel-dist window -> inf window)
    mask, _sur = npm.compute_local_mask(
        system.m, jnp.asarray(center, jnp.float32), jnp.int32(0),
        system.travel_dev, jnp.float32(cfg.local_map_radius),
        jnp.float32(np.inf), max_local=cfg.max_local_points)
    return gather_local_data(system.m, mask, cfg.max_local_points)


def render_poses(args, cfg, system, poses, out_dir):
    """Re-render the map along poses (reference render_with_poses,
    inspect_pings.py:361+)."""
    import jax.numpy as jnp

    from pings_tpu.models.renderer import render
    from pings_tpu.models.spawn import spawn_kwargs_from_cfg

    os.makedirs(out_dir, exist_ok=True)
    frames = []
    local = None
    last_center = None
    for i, T in enumerate(poses[::args.stride]):
        center = T[:3, 3]
        if last_center is None or \
                np.linalg.norm(center - last_center) > 0.5 * float(
                    cfg.local_map_radius):
            local = _local_data(cfg, system, center)
            last_center = center
        cam = _camera(args, T)
        res = render(local, system.decoders, cam, args.width, args.height,
                     spawn_kwargs=spawn_kwargs_from_cfg(cfg),
                     max_per_tile=cfg.max_gs_per_tile,
                     gs_type=cfg.gs_type, precision=cfg.raster_precision)
        rgb = np.clip(np.asarray(res.rgb) * 255, 0, 255).astype(np.uint8)
        frames.append(rgb)
        if args.video is None:
            import imageio.v2 as imageio

            imageio.imwrite(os.path.join(out_dir, f"render_{i:05d}.png"),
                            rgb)
    if args.video is not None and frames:
        import imageio.v2 as imageio

        imageio.mimwrite(os.path.join(out_dir, args.video), frames, fps=10)
    return len(frames)


def eval_heldout(args, cfg, system, out_dir):
    """Held-out view metrics (reference gs_eval_offline,
    mapper.py:1691-2211) -> gs_eval.csv."""
    import csv

    if getattr(args, "cam_refine", False):
        cfg.gs_eval_cam_refine_on = True

    import jax.numpy as jnp

    from pings_tpu.data.base import dataset_factory
    from pings_tpu.eval.image import image_metrics
    from pings_tpu.models.renderer import CamView, render
    from pings_tpu.models.spawn import spawn_kwargs_from_cfg

    ds = dataset_factory(args.loader or cfg.data_loader_name,
                         args.data_path or cfg.pc_path,
                         args.seq if args.seq is not None
                         else cfg.data_loader_seq, cfg)
    rows = []
    poses = system.poses
    local, last_center = None, None
    for i in range(0, min(len(ds), len(poses))):
        fr = ds[i]
        if "img" not in fr:
            continue
        cam_name = next(iter(fr["img"]))
        img = fr["img"][cam_name].astype(np.float32) / 255.0
        h, w = img.shape[:2]
        K = np.asarray(fr["K"][cam_name])
        T_c_l = np.asarray(fr["T_c_l"][cam_name])
        T_c_w = T_c_l @ np.linalg.inv(poses[i])
        center = poses[i][:3, 3]
        if last_center is None or np.linalg.norm(center - last_center) > \
                0.5 * float(cfg.local_map_radius):
            local = _local_data(cfg, system, center)
            last_center = center
        z = jnp.zeros((h, w))
        cam = CamView(K=jnp.asarray(K, jnp.float32),
                      T_c_w=jnp.asarray(T_c_w, jnp.float32),
                      rgb=jnp.asarray(img), depth=z, sky=z,
                      frame_id=jnp.int32(i))
        theta = rho = None
        if cfg.gs_eval_cam_refine_on:
            theta, rho = refine_view_pose(
                cfg, local, system.decoders, cam, w, h,
                iters=cfg.gs_eval_cam_refine_iters)
        res = render(local, system.decoders, cam, w, h,
                     theta=theta, rho=rho,
                     spawn_kwargs=spawn_kwargs_from_cfg(cfg),
                     max_per_tile=cfg.max_gs_per_tile,
                     gs_type=cfg.gs_type, precision=cfg.raster_precision)
        pred = np.asarray(res.rgb)
        met = image_metrics(pred, img, with_lpips=True)
        met["frame"] = i
        met["split"] = "test" if i % args.eval_every == 0 else "train"
        if "depth" in fr:
            d_gt = np.asarray(fr["depth"][cam_name])
            d_pred = np.asarray(res.depth)
            ok = d_gt > 1e-4
            if ok.any():
                met["depth_l1"] = float(
                    np.abs(d_pred[ok] - d_gt[ok]).mean())
        rows.append(met)
    if rows:
        keys = sorted({k for r in rows for k in r})
        with open(os.path.join(out_dir, "gs_eval.csv"), "w",
                  newline="") as f:
            wtr = csv.DictWriter(f, fieldnames=keys)
            wtr.writeheader()
            wtr.writerows(rows)
    summary = {}
    for split in ("train", "test"):
        sel = [r for r in rows if r["split"] == split]
        if sel:
            for k in ("psnr", "ssim", "lpips", "lpips_rand", "depth_l1"):
                vals = [r[k] for r in sel if k in r]
                if vals:
                    summary[f"{split}_{k}"] = float(np.mean(vals))
    return summary


def refine_view_pose(cfg, local, decoders, cam, w, h, iters=50,
                     lr=1e-3):
    """Per-view camera pose refinement before eval (reference
    gs_eval_offline's cam-refine loop, mapper.py:1774-1860): optimize a
    (theta, rho) se3 delta on the photometric L1 against the target view.
    Returns the refined delta to pass into render()."""
    import jax
    import jax.numpy as jnp
    import optax

    from pings_tpu.models.renderer import render
    from pings_tpu.models.spawn import spawn_kwargs_from_cfg

    spawn_kwargs = spawn_kwargs_from_cfg(cfg)

    def loss(tr):
        theta, rho = tr
        res = render(local, decoders, cam, w, h, theta=theta, rho=rho,
                     spawn_kwargs=spawn_kwargs,
                     max_per_tile=cfg.max_gs_per_tile,
                     gs_type=cfg.gs_type, precision=cfg.raster_precision)
        # robust photometric term for the per-view refine (reference
        # tukey_loss c=0.5, inspect_pings.py:643)
        from pings_tpu.mapping.losses import tukey_loss
        return tukey_loss(res.rgb, cam.rgb, c=0.5)

    opt = optax.adam(lr)

    @jax.jit
    def step(tr, state):
        g = jax.grad(loss)(tr)
        upd, state = opt.update(g, state)
        return optax.apply_updates(tr, upd), state

    tr = (jnp.zeros(3), jnp.zeros(3))
    state = opt.init(tr)
    for _ in range(iters):
        tr, state = step(tr, state)
    return tr


def export_points(system, mode: str, path: str):
    """Neural point export with color modes (reference
    neural_gaussians.py:727-868)."""
    m = system.m
    n = int(m.count)
    xyz = np.asarray(m.positions[:n])
    if mode == "rgb":
        col = np.clip(np.asarray(m.rgb[:n]), 0, 1)
    elif mode == "height":
        z = xyz[:, 2]
        t = (z - z.min()) / max(z.max() - z.min(), 1e-6)
        col = np.stack([t, 1 - np.abs(t - 0.5) * 2, 1 - t], -1)
    elif mode == "time":
        t = np.asarray(m.ts_create[:n], np.float32)
        t = t / max(t.max(), 1.0)
        col = np.stack([t, 1 - t, np.zeros_like(t)], -1)
    else:  # certainty
        c = np.asarray(m.certainty[:n])
        c = c / max(float(c.max()), 1e-6)
        col = np.stack([c, c, c], -1)
    from pings_tpu.slam.mesher import write_ply

    write_ply(path, xyz, np.zeros((0, 3), np.int32), col)
    return n


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg, system = load_system(args.run_dir)
    out_dir = args.out or os.path.join(args.run_dir, "inspect")
    os.makedirs(out_dir, exist_ok=True)
    report = {"map_points": int(system.m.count),
              "n_poses": len(system.poses)}

    if args.export_points:
        path = os.path.join(out_dir, f"neural_points_{args.export_points}.ply")
        report["exported_points"] = export_points(
            system, args.export_points, path)

    if args.sdf_slice is not None:
        from pings_tpu.slam.mesher import Mesher

        mesher = Mesher(cfg)
        n = int(system.m.count)
        xyz = np.asarray(system.m.positions[:n])
        lo, hi = xyz.min(0), xyz.max(0)
        res = args.mc_res or cfg.mc_res_m
        dims = (max(int((hi[0] - lo[0]) / res), 1),
                max(int((hi[1] - lo[1]) / res), 1), 1)
        origin = np.array([lo[0], lo[1], args.sdf_slice])
        sdf, valid = mesher.query_sdf_grid(system.m, system.decoders,
                                           origin, dims, res)
        np.save(os.path.join(out_dir, "sdf_slice.npy"),
                np.where(valid, sdf, np.nan)[:, :, 0])
        report["sdf_slice"] = [dims[0], dims[1]]

    if args.recon_3d:
        from pings_tpu.slam.mesher import Mesher, write_ply

        if args.mc_res:
            cfg.mc_res_m = args.mc_res
        mesher = Mesher(cfg)
        v, t, c = mesher.recon_map_mesh(system.m, system.decoders)
        write_ply(os.path.join(out_dir, "mesh.ply"), v, t, c)
        report["mesh_verts"] = len(v)

    if args.render or args.video:
        if args.poses:
            from pings_tpu.eval.traj import read_kitti_poses

            poses = read_kitti_poses(args.poses)
        else:
            poses = system.poses
        if args.frame >= 0:
            poses = poses[args.frame:args.frame + 1]
        report["rendered"] = render_poses(args, cfg, system, poses,
                                          os.path.join(out_dir, "renders"))

    if args.eval:
        report.update(eval_heldout(args, cfg, system, out_dir))

    print(json.dumps(report, indent=2, default=float))
    return report


if __name__ == "__main__":
    main()
