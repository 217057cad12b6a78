"""Regenerate RESULTS.md's numeric tables from the committed artifacts.

Round-4 verdict: hand-pasted numbers drifted from the committed JSONs in
two consecutive rounds. This script rewrites every block delimited by
    <!-- AUTOGEN:<name> -->
    ...
    <!-- /AUTOGEN:<name> -->
in RESULTS.md from `BENCH_r*.json` and `results_validation.json`, so the
prose can only cite numbers that byte-match the artifacts.
`tests/test_validation_results.py` gates that running this script leaves
RESULTS.md unchanged.
"""

import glob
import json
import os
import re
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")


def bench_rows():
    rows = ["| round | Mpix/s | vs 50 Mpix/s A100 baseline | turbo "
            "(Kmax=64) | surfel | typical scene |",
            "|---|---|---|---|---|---|"]
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        rnd = re.search(r"BENCH_r(\d+)", path).group(1)
        with open(path) as f:
            d = json.load(f)
        p = d.get("parsed") or {}
        if not p:
            continue
        fmt = lambda k: ("" if p.get(k) is None else f"{p[k]}")
        rows.append(
            f"| r{rnd} | {p['value']} | {p['vs_baseline']} | "
            f"{fmt('turbo_kmax64_mpix_s')} | {fmt('surfel_mpix_s')} | "
            f"{fmt('typical_scene_mpix_s')} |")
    return "\n".join(rows)


def replica_rows(res):
    r = res["replica_synth"]
    ge = r["gs_eval"]
    rows = [
        "| metric (latest committed run) | value |",
        "|---|---|",
        f"| frames | {r['frames']} |",
        f"| in-seq (train view) PSNR / SSIM / depth-L1 | "
        f"{ge['train']['psnr']:.2f} / {ge['train']['ssim']:.3f} / "
        f"{ge['train']['depth_l1']:.3f} m |",
        f"| **true held-out** (every 5th, never keyframed) PSNR / SSIM / "
        f"depth-L1 | {ge['test']['psnr']:.2f} / {ge['test']['ssim']:.3f} / "
        f"{ge['test']['depth_l1']:.3f} m |",
        f"| map points | {r['map_points'] / 1000:.1f}k |",
        f"| sec/frame (steady-state / incl. compile) | "
        f"{r.get('sec_per_frame_steady', '')} / {r['sec_per_frame']} |",
        f"| run | {os.path.basename(r['run_dir'])} |",
    ]
    return "\n".join(rows)


def smooth_rows(res):
    h = res["replica_synth"]["gs_eval"]["test"]
    s = res["replica_synth_smooth"]["gs_eval"]["test"]
    return "\n".join([
        "| texture | held-out PSNR | held-out SSIM | depth-L1 |",
        "|---|---|---|---|",
        f"| hard 1 m checkers | {h['psnr']:.2f} | {h['ssim']:.3f} | "
        f"{h['depth_l1']:.3f} m |",
        f"| smooth color fields | **{s['psnr']:.2f}** | "
        f"**{s['ssim']:.3f}** | {s['depth_l1']:.3f} m |",
    ])


def kitti_rows(res):
    k = res["kitti_synth"]
    o = k.get("odom_only", {})
    ge = k.get("gs_eval") or {}
    rows = [
        "| metric | full SLAM | odometry-only |",
        "|---|---|---|",
        f"| frames / aborted | {k['frames']} / "
        f"{'yes' if k.get('aborted') else 'no'} | — |",
        f"| travel (GT ≈ 280 m) | {k.get('travel_m')} m | — |",
        f"| ATE trans RMSE / rot RMSE | {k['ate_trans_rmse_m']:.3f} m / "
        f"{k['ate_rot_rmse_deg']:.2f}° | "
        f"**{o.get('ate_trans_rmse_m', float('nan')):.3f} m / "
        f"{o.get('ate_rot_rmse_deg', float('nan')):.2f}°** |",
        f"| ARTE trans / rot | {k.get('arte_trans_pct', float('nan')):.2f} "
        f"% / {k.get('arte_rot_deg_per_100m', float('nan')):.2f}°/100m | "
        f"**{o.get('arte_trans_pct', float('nan')):.2f} % / "
        f"{o.get('arte_rot_deg_per_100m', float('nan')):.2f}°/100m** |",
        f"| loops applied / skipped-uninformative | {k.get('loops')} / "
        f"{k.get('loops_uninformative', 0)} | — |",
        f"| sec/frame (incl. compile / steady) | {k['sec_per_frame']} / "
        f"{k.get('sec_per_frame_steady', '')} | — |",
        f"| online training PSNR (last 10 frames) | "
        f"{k.get('gs_psnr_online')} | — |",
    ]
    if ge:
        rows.append(
            f"| **held-out NVS** PSNR / SSIM / depth-L1 | "
            f"{ge['test']['psnr']:.2f} / {ge['test']['ssim']:.3f} / "
            f"{ge['test']['depth_l1']:.3f} m | — |")
        rows.append(
            f"| in-seq (train view) NVS PSNR / SSIM | "
            f"{ge['train']['psnr']:.2f} / {ge['train']['ssim']:.3f} | — |")
    rows.append(f"| run | {os.path.basename(k['run_dir'])} |  |")
    return "\n".join(rows)


def noisy_rows(res):
    k = res.get("kitti_synth_noisy")
    if k is None:
        return None
    o = k.get("odom_only", {})
    return "\n".join([
        "| metric | full SLAM (loops on) | corrupted odometry |",
        "|---|---|---|",
        f"| ATE trans RMSE | **{k['ate_trans_rmse_m']:.3f} m** | "
        f"{o.get('ate_trans_rmse_m', float('nan')):.3f} m |",
        f"| ATE rot RMSE | {k['ate_rot_rmse_deg']:.2f}° | "
        f"{o.get('ate_rot_rmse_deg', float('nan')):.2f}° |",
        f"| ARTE trans | {k.get('arte_trans_pct', float('nan')):.2f} % | "
        f"{o.get('arte_trans_pct', float('nan')):.2f} % |",
        f"| loops applied / skipped-uninformative | {k.get('loops')} / "
        f"{k.get('loops_uninformative', 0)} | — |",
        f"| frames / aborted | {k['frames']} / "
        f"{'yes' if k.get('aborted') else 'no'} | — |",
        f"| run | {os.path.basename(k['run_dir'])} |  |",
    ])


def loop_rows():
    path = os.path.join(REPO, "runs_validation",
                        "loop_value_experiment.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        d = json.load(f)
    rc = d["recorded_drift_cov"]
    rw = d["random_walk_summary"]
    nl = d.get("recorded_noisy_loop_drift_cov", {})
    rows = [
        "| regime | odometry ATE | with loop | endpoint |",
        "|---|---|---|---|",
        f"| recorded circuit + GT-perfect loop | "
        f"{rc['odometry']['ate_aligned_m']} m | "
        f"{rc['with_perfect_loop']['ate_aligned_m']} m | "
        f"{rc['odometry']['endpoint_m']} → "
        f"{rc['with_perfect_loop']['endpoint_m']} m |",
        f"| random-walk 1%/m (3 seeds, mean) | {rw['odom_ate_mean']} m | "
        f"{rw['loop_ate_mean_drift_cov']} m (drift-cov; const-cov "
        f"{rw['loop_ate_mean_const_cov']}) | — |",
    ]
    if nl:
        pts = ", ".join(f"σ={k.split('_')[1]}: {v['ate_mean']}"
                        for k, v in nl.items())
        rows.append(f"| recorded + noisy loop measurement (mean ATE) | "
                    f"{rc['odometry']['ate_aligned_m']} m | {pts} | — |")
    return "\n".join(rows)


def main(check=False):
    with open(os.path.join(REPO, "results_validation.json")) as f:
        res = json.load(f)
    blocks = {
        "bench": bench_rows(),
        "replica": replica_rows(res),
        "smooth": smooth_rows(res),
        "kitti": kitti_rows(res),
    }
    lv = loop_rows()
    if lv:
        blocks["loopvalue"] = lv
    nz = noisy_rows(res)
    if nz:
        blocks["noisy"] = nz

    path = os.path.join(REPO, "RESULTS.md")
    with open(path) as f:
        text = f.read()
    orig = text
    for name, body in blocks.items():
        pat = re.compile(
            rf"(<!-- AUTOGEN:{name} -->).*?(<!-- /AUTOGEN:{name} -->)",
            re.S)
        if pat.search(text):
            text = pat.sub(
                lambda m: m.group(1) + "\n" + body + "\n" + m.group(2),
                text)
    if check:
        if text != orig:
            print("RESULTS.md is stale — run scripts/gen_results_tables.py")
            return 1
        print("RESULTS.md tables match artifacts")
        return 0
    with open(path, "w") as f:
        f.write(text)
    print("RESULTS.md tables regenerated")
    return 0


if __name__ == "__main__":
    sys.exit(main(check="--check" in sys.argv))
