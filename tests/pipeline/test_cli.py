"""CLI command tests on the fake-device CPU backend."""

import json
import os

import numpy as np
import pytest

from stereo_tpu.cli import main


SMALL = ["--set", "num_disparities=16"]


def test_cli_stream_synthetic(tmp_path, capsys):
    rc = main([
        "stream", "--preset", "kitti_sgm8_128", *SMALL,
        "--limit", "4", "--batch", "2", "--batch-axis", "2",
        "--tiles", "1,1", "--demo-shape", "48", "80",
        "--manifest", str(tmp_path / "m.json"),
    ])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    stats = json.loads(out)
    assert stats["frames"] == 4


def test_cli_run_rank_cost(tmp_path, capsys):
    rc = main([
        "run", "--demo", "--demo-shape", "48", "80", "--demo-max-disp", "8",
        "--preset", "kitti_sgm8_128", "--set", "num_disparities=16",
        "--set", "cost_fn=rank",
        "--out", str(tmp_path / "d.pfm"),
    ])
    assert rc == 0
    assert os.path.exists(tmp_path / "d.pfm")
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["bad3"] < 0.05


def test_cli_run_fill_occlusions(capsys):
    """--set fill_occlusions=true reaches host_postprocess: density ~1."""
    rc = main([
        "run", "--demo", "--demo-shape", "48", "80", "--demo-max-disp", "8",
        "--preset", "kitti_sgm8_128", *SMALL,
        "--set", "fill_occlusions=true",
    ])
    assert rc == 0
    m = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert m["density"] > 0.999
    assert m["bad3"] < 0.10


def test_cli_scale_harness(capsys):
    """cli scale on fake devices: rows are valid JSON with sane fields
    (validates the instrument, not the hardware — VERDICT r2 #3)."""
    rc = main([
        "scale", "--preset", "kitti_sgm8_128", *SMALL,
        "--demo-shape", "48", "80", "--devices", "1,2", "--iters", "2",
    ])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [r["devices"] for r in rows] == [1, 2]
    for r in rows:
        assert r["fps"] > 0
        assert 0 < r["efficiency"] <= 1.5
    assert rows[0]["efficiency"] == 1.0


def test_cli_bench_quick(capsys):
    rc = main([
        "bench", "--preset", "middlebury_census_sgm4_64", *SMALL,
        "--demo-shape", "48", "80", "--demo-max-disp", "8", "--iters", "3",
    ])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["fps"] > 0


def test_cli_run_pyramid_model(capsys):
    rc = main([
        "run", "--demo", "--demo-shape", "64", "96", "--demo-max-disp", "12",
        "--preset", "kitti_sgm8_128", "--set", "num_disparities=32",
        "--model", "pyramid",
    ])
    assert rc == 0


def test_cli_run_depth_and_ply(tmp_path, capsys):
    depth = tmp_path / "z.npy"
    ply = tmp_path / "cloud.ply"
    rc = main([
        "run", "--demo", "--demo-shape", "48", "80", "--demo-max-disp", "8",
        "--preset", "kitti_sgm8_128", *SMALL,
        "--rig", "500,0.2",
        "--depth-out", str(depth), "--ply", str(ply),
    ])
    assert rc == 0
    z = np.load(depth)
    assert z.shape == (48, 80)
    assert (z[z > 0] > 0).all()
    header = ply.read_text().splitlines()[:8]
    assert header[0] == "ply"
