#!/usr/bin/env python3
"""End-to-end validation runs on real-format synthetic sequences.

Zero-egress substitute for the reference's Replica / KITTI-example
validation (VERDICT.md item 2): generates sequences in the real datasets'
on-disk formats (scripts/make_validation_data.py), runs them through the
actual loader + CLI pipeline, evaluates, and records machine-readable
results (results_validation.json) + RESULTS.md.

- replica_synth: RGB-D mapping-only (GT poses, tracker off) ->
  in-sequence + held-out PSNR/SSIM/depth-L1 via inspect_map --eval.
- kitti_synth: LiDAR+camera SLAM (tracker on) -> ATE / ARTE.

Usage: python scripts/run_validation.py [--data-dir D] [--out-dir O]
           [--skip-gen] [--frames-replica N] [--frames-kitti N]
"""

import argparse
import csv
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    t0 = time.time()
    subprocess.run(cmd, check=True, cwd=REPO, **kw)
    return time.time() - t0


def latest_run_dir(out_root: str, name: str) -> str:
    # match "<name>_<timestamp>" exactly — "replica_synth" must NOT match
    # "replica_synth_smooth_..." (the texture-experiment variant dirs)
    import re
    pat = re.compile(re.escape(name) + r"_\d{8}_\d{6}$")
    runs = sorted(d for d in os.listdir(out_root) if pat.match(d))
    assert runs, f"no run dir for {name} under {out_root}"
    return os.path.join(out_root, runs[-1])


def read_summary(run_dir: str) -> dict:
    with open(os.path.join(run_dir, "summary.json")) as f:
        return json.load(f)


def read_gs_eval(path: str) -> dict:
    rows = list(csv.DictReader(open(path)))
    out = {}
    for split in ("train", "test"):
        sel = [r for r in rows if r["split"] == split]
        if sel:
            out[split] = {
                k: round(sum(float(r[k]) for r in sel) / len(sel), 4)
                for k in ("psnr", "ssim", "depth_l1") if k in sel[0]
            }
            if "lpips" in sel[0] and sel[0]["lpips"] not in ("", "nan"):
                out[split]["lpips"] = round(
                    sum(float(r["lpips"]) for r in sel) / len(sel), 4)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=os.path.join(REPO, "data_validation"))
    ap.add_argument("--out-dir", default=os.path.join(REPO, "runs_validation"))
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument("--frames-replica", type=int, default=60)
    # one full lap of the ~254 m circuit at 1.2 m/frame is ~212 frames
    # (+15 for the from-rest acceleration ramp); 250 revisits the start
    # by ~25 m so loop closure fires and ARTE segments (100/200 m) are
    # reachable
    ap.add_argument("--frames-kitti", type=int, default=250)
    ap.add_argument("--only", choices=("replica", "kitti", "kitti_noisy"),
                    default=None)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    py = sys.executable
    results = {}

    if not args.skip_gen:
        gen = [py, "scripts/make_validation_data.py", args.data_dir,
               "--frames-replica", str(args.frames_replica),
               "--frames-kitti", str(args.frames_kitti)]
        if args.only:
            # kitti_noisy reuses the kitti_synth dataset
            gen += ["--only",
                    "kitti" if args.only == "kitti_noisy" else args.only]
        run(gen)

    if args.only in (None, "replica"):
        wall = run([py, "-m", "pings_tpu.cli", "configs/replica_synth.yaml",
                    "--data-path", os.path.join(args.data_dir, "replica_synth"),
                    "--no-track", "--output", args.out_dir])
        rd = latest_run_dir(args.out_dir, "replica_synth")
        summ = read_summary(rd)
        run([py, "-m", "pings_tpu.inspect_map", rd, "--eval",
             "--loader", "replica",
             "--data-path", os.path.join(args.data_dir, "replica_synth"),
             "--seq", "room_synth", "--eval-every", "5"])
        gs_eval = read_gs_eval(os.path.join(rd, "inspect", "gs_eval.csv"))
        results["replica_synth"] = {
            "mode": "mapping-only (GT poses)",
            "frames": summ["frames"],
            "sec_per_frame": round(summ["sec_per_frame"], 2),
            "wall_s": round(wall, 1),
            "map_points": summ["map_points"],
            "gs_eval": gs_eval,
            "run_dir": rd,
        }

    def kitti_record(rd, summ, wall, mode):
        rec = {
            "mode": mode,
            "frames": summ["frames"],
            "sec_per_frame": round(summ["sec_per_frame"], 2),
            "sec_per_frame_steady": summ.get("sec_per_frame_steady"),
            "max_frame_sec": summ.get("max_frame_sec"),
            "wall_s": round(wall, 1),
            "map_points": summ["map_points"],
            "loops": summ.get("loops"),
            "loops_uninformative": summ.get("loops_uninformative"),
            "travel_m": summ.get("travel_m"),
            "aborted": summ.get("aborted"),
            "ate_trans_rmse_m": round(summ["ate_trans_rmse_m"], 4),
            "ate_rot_rmse_deg": round(summ["ate_rot_rmse_deg"], 3),
            "arte_trans_pct": summ.get("arte_trans_pct"),
            "arte_rot_deg_per_100m": summ.get("arte_rot_deg_per_100m"),
            "gs_psnr_online": summ.get("gs_psnr"),
            "odom_only": summ.get("odom_only"),
            "run_dir": rd,
        }
        return rec

    if args.only in (None, "kitti"):
        wall = run([py, "-m", "pings_tpu.cli", "configs/kitti_synth.yaml",
                    "--data-path", os.path.join(args.data_dir, "kitti_synth"),
                    "--output", args.out_dir])
        rd = latest_run_dir(args.out_dir, "kitti_synth")
        summ = read_summary(rd)
        results["kitti_synth"] = kitti_record(rd, summ, wall,
                                              "full SLAM (tracker on)")
        # held-out outdoor NVS eval (VERDICT r4 item 2): every 5th frame
        # is excluded from keyframing by the config; render them from
        # the saved map along the ESTIMATED trajectory with per-view
        # cam refinement (the reference gs_eval_offline's refine loop —
        # NVS quality, not localization, is under test here)
        run([py, "-m", "pings_tpu.inspect_map", rd, "--eval",
             "--loader", "kitti",
             "--data-path", os.path.join(args.data_dir, "kitti_synth"),
             "--seq", "00", "--eval-every", "5", "--cam-refine"])
        results["kitti_synth"]["gs_eval"] = read_gs_eval(
            os.path.join(rd, "inspect", "gs_eval.csv"))

    if args.only in (None, "kitti_noisy"):
        # random-walk odometry regime: loop closures must PAY here
        # (VERDICT r4 item 3 done-criterion; gate
        # test_kitti_noisy_loop_pays)
        wall = run([py, "-m", "pings_tpu.cli",
                    "configs/kitti_synth_noisy.yaml",
                    "--data-path", os.path.join(args.data_dir, "kitti_synth"),
                    "--output", args.out_dir])
        rd = latest_run_dir(args.out_dir, "kitti_synth_noisy")
        summ = read_summary(rd)
        results["kitti_synth_noisy"] = kitti_record(
            rd, summ, wall,
            "full SLAM, random-walk odometry noise injected (1 %/m)")

    out_json = os.path.join(REPO, "results_validation.json")
    existing = {}
    if os.path.exists(out_json):
        with open(out_json) as f:
            existing = json.load(f)
    existing.update(results)
    with open(out_json, "w") as f:
        json.dump(existing, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
