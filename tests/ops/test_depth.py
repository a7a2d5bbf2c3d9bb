"""Depth / reprojection utilities (stereo_tpu/utils/depth.py)."""

import numpy as np

from stereo_tpu.utils.depth import (
    CameraRig,
    disparity_to_depth,
    parse_middlebury_calib,
    reproject,
    write_ply,
)


def test_depth_inverts_disparity():
    rig = CameraRig(focal_px=1000.0, baseline=0.5)
    disp = np.array([[10.0, 20.0], [0.0, 50.0]], np.float32)
    valid = np.array([[True, True], [True, False]])
    z = np.asarray(disparity_to_depth(disp, valid, rig))
    assert np.isclose(z[0, 0], 1000.0 * 0.5 / 10.0)
    assert np.isclose(z[0, 1], 1000.0 * 0.5 / 20.0)
    assert z[1, 0] == 0.0  # zero disparity -> no depth
    assert z[1, 1] == 0.0  # invalid -> no depth


def test_depth_doffs_offset():
    rig = CameraRig(focal_px=3000.0, baseline=193.0, doffs=131.0)
    disp = np.full((4, 4), 100.0, np.float32)
    valid = np.ones((4, 4), bool)
    z = np.asarray(disparity_to_depth(disp, valid, rig))
    assert np.allclose(z, 3000.0 * 193.0 / (100.0 + 131.0))


def test_reproject_center_ray():
    rig = CameraRig(focal_px=500.0, baseline=0.2, cx=2.0, cy=1.0)
    disp = np.full((3, 5), 10.0, np.float32)
    valid = np.ones((3, 5), bool)
    pts = np.asarray(reproject(disp, valid, rig))
    z = 500.0 * 0.2 / 10.0
    # principal-point pixel projects straight ahead
    assert np.allclose(pts[1, 2], [0.0, 0.0, z])
    # one pixel right of center: X = 1 * Z / f
    assert np.allclose(pts[1, 3], [z / 500.0, 0.0, z])


def test_parse_middlebury_calib(tmp_path):
    p = tmp_path / "calib.txt"
    p.write_text(
        "cam0=[3997.684 0 1176.728; 0 3997.684 1011.728; 0 0 1]\n"
        "cam1=[3997.684 0 1307.839; 0 3997.684 1011.728; 0 0 1]\n"
        "doffs=131.111\nbaseline=193.001\nwidth=2964\nheight=1988\n"
    )
    rig = parse_middlebury_calib(str(p))
    assert np.isclose(rig.focal_px, 3997.684)
    assert np.isclose(rig.baseline, 193.001)
    assert np.isclose(rig.doffs, 131.111)
    assert np.isclose(rig.cx, 1176.728)
    assert np.isclose(rig.cy, 1011.728)


def test_write_ply_counts_and_header(tmp_path):
    rig = CameraRig(focal_px=100.0, baseline=1.0)
    disp = np.full((4, 4), 5.0, np.float32)
    valid = np.ones((4, 4), bool)
    valid[0, 0] = False
    pts = reproject(disp, valid, rig)
    gray = np.full((4, 4), 128, np.uint8)
    out = tmp_path / "cloud.ply"
    n = write_ply(str(out), pts, valid, colors=gray)
    assert n == 15
    text = out.read_text().splitlines()
    assert text[0] == "ply"
    assert f"element vertex {n}" in text[2]
    assert len([l for l in text if l and l[0].isdigit() or
                (l and l[0] == "-")]) >= n


def test_write_ply_max_depth(tmp_path):
    rig = CameraRig(focal_px=100.0, baseline=1.0)
    disp = np.array([[1.0, 50.0]], np.float32)  # depths 100 and 2
    valid = np.ones((1, 2), bool)
    pts = reproject(disp, valid, rig)
    out = tmp_path / "c.ply"
    n = write_ply(str(out), pts, valid, max_depth=10.0)
    assert n == 1
