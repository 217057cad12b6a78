"""CLI run -> checkpoint -> inspector round trip (reference
inspect_pings.py workflow)."""

import glob
import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def saved_run(tmp_path_factory):
    from pings_tpu.cli import build_parser, run

    out = str(tmp_path_factory.mktemp("run"))
    args = build_parser().parse_args(
        ["configs/run_synthetic.yaml", "--range", "0", "3", "1",
         "--tag", "t", "--output", out, "--quiet"])
    res = run(args)
    assert res["frames"] == 3
    run_dir = glob.glob(os.path.join(out, "*"))[0]
    assert os.path.exists(os.path.join(run_dir, "model", "pin_map.npz"))
    return run_dir


def test_inspect_export_and_slice(saved_run):
    from pings_tpu.inspect_map import build_parser, main

    rep = main([saved_run, "--export-points", "height",
                "--sdf-slice", "1.0", "--mc-res", "0.5"])
    assert rep["map_points"] > 500
    assert rep["exported_points"] == rep["map_points"]
    out = os.path.join(saved_run, "inspect")
    assert os.path.exists(os.path.join(out,
                                       "neural_points_height.ply"))
    sl = np.load(os.path.join(out, "sdf_slice.npy"))
    assert sl.ndim == 2 and np.isfinite(sl).any()


def test_inspect_render(saved_run):
    from pings_tpu.inspect_map import main

    rep = main([saved_run, "--render", "--stride", "2",
                "--width", "64", "--height", "48", "--fx", "40"])
    assert rep["rendered"] >= 1
    pngs = glob.glob(os.path.join(saved_run, "inspect", "renders",
                                  "*.png"))
    assert len(pngs) == rep["rendered"]


def test_inspect_eval(saved_run):
    from pings_tpu.inspect_map import main

    rep = main([saved_run, "--eval", "--eval-every", "2"])
    assert "train_psnr" in rep or "test_psnr" in rep
    assert os.path.exists(os.path.join(saved_run, "inspect",
                                       "gs_eval.csv"))
