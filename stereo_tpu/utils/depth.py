"""Disparity -> metric depth / 3-D reprojection (SURVEY.md C11 consumers).

The reference family's output is a disparity map; downstream users turn it
into depth and point clouds via the rectified rig's calibration
(Z = f * B / (d + doffs), the Middlebury calib.txt convention where doffs
is the difference of principal-point x offsets). This module is that
last-mile conversion: pure jnp math (jit/vmap-friendly, runs on device
alongside the pipeline) plus a host-side PLY writer for inspection.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass(frozen=True)
class CameraRig:
    """Rectified stereo rig intrinsics.

    focal_px: focal length in pixels (fx of the rectified left camera).
    baseline: camera separation, in whatever unit depth should come out in
      (Middlebury calib.txt gives mm; KITTI gives m).
    doffs: principal-point x difference cx_right - cx_left (Middlebury's
      "doffs"; 0 for KITTI-style rigs).
    cx, cy: left principal point for reprojection (default: image center).
    """

    focal_px: float
    baseline: float
    doffs: float = 0.0
    cx: Optional[float] = None
    cy: Optional[float] = None


def parse_middlebury_calib(path: str) -> CameraRig:
    """Parse a Middlebury 2014 ``calib.txt`` into a CameraRig.

    Lines look like::

        cam0=[3997.684 0 1176.728; 0 3997.684 1011.728; 0 0 1]
        doffs=131.111
        baseline=193.001
    """
    vals = {}
    with open(path) as f:
        for line in f:
            if "=" not in line:
                continue
            k, v = line.strip().split("=", 1)
            vals[k] = v
    m = vals.get("cam0", "").strip("[]").replace(";", " ").split()
    if len(m) < 9:
        raise ValueError(f"no cam0 matrix in {path}")
    fx, cx, cy = float(m[0]), float(m[2]), float(m[5])
    return CameraRig(
        focal_px=fx,
        baseline=float(vals.get("baseline", 0.0)),
        doffs=float(vals.get("doffs", 0.0)),
        cx=cx,
        cy=cy,
    )


def disparity_to_depth(disp, valid, rig: CameraRig, eps: float = 1e-6):
    """Z = f * B / (d + doffs); invalid or near-zero disparity -> 0 depth.

    Pure jnp (device-friendly); accepts numpy too. Returns float32 [H, W].
    """
    import jax.numpy as jnp

    d = jnp.asarray(disp, jnp.float32) + jnp.float32(rig.doffs)
    z = jnp.float32(rig.focal_px * rig.baseline) / jnp.maximum(d, eps)
    ok = jnp.asarray(valid, bool) & (d > eps)
    return jnp.where(ok, z, 0.0)


def reproject(disp, valid, rig: CameraRig):
    """Disparity -> [H, W, 3] XYZ points in the left camera frame.

    X = (x - cx) * Z / f,  Y = (y - cy) * Z / f,  Z as disparity_to_depth.
    Invalid pixels get (0, 0, 0).
    """
    import jax.numpy as jnp

    disp = jnp.asarray(disp, jnp.float32)
    h, w = disp.shape
    cx = rig.cx if rig.cx is not None else (w - 1) / 2.0
    cy = rig.cy if rig.cy is not None else (h - 1) / 2.0
    z = disparity_to_depth(disp, valid, rig)
    xs = (jnp.arange(w, dtype=jnp.float32) - cx)[None, :]
    ys = (jnp.arange(h, dtype=jnp.float32) - cy)[:, None]
    inv_f = jnp.float32(1.0 / rig.focal_px)
    x = xs * z * inv_f
    y = ys * z * inv_f
    return jnp.stack([x, y, z], axis=-1)


def write_ply(path: str, points, valid, colors=None,
              max_depth: Optional[float] = None) -> int:
    """Write valid points as an ASCII PLY file; returns the vertex count.

    colors: optional [H, W] grayscale (uint8) or [H, W, 3] RGB.
    max_depth: drop points beyond this Z (sky/occlusion spikes).
    """
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    ok = np.asarray(valid, bool).reshape(-1) & (pts[:, 2] > 0)
    if max_depth is not None:
        ok &= pts[:, 2] <= max_depth
    pts = pts[ok]
    rgb = None
    if colors is not None:
        c = np.asarray(colors)
        if c.ndim == 2:
            c = np.repeat(c[..., None], 3, axis=-1)
        rgb = c.reshape(-1, 3)[ok].astype(np.uint8)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if rgb is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write("end_header\n")
        if rgb is None:
            for p in pts:
                f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f}\n")
        else:
            for p, c in zip(pts, rgb):
                f.write(
                    f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} {c[0]} {c[1]} {c[2]}\n"
                )
    return len(pts)
