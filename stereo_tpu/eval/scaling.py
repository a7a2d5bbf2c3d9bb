"""Scaling-efficiency measurement (BASELINE.json:5: fps at 1 chip / 1 host
/ N hosts, >=80% efficiency at 2 hosts).

Measures the batched stream pipeline at increasing device counts on
whatever devices exist (real chips on a pod slice; fake CPU devices in
CI, where the numbers validate the harness rather than the hardware) and
reports throughput plus efficiency relative to linear scaling of the
single-device rate.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np

from ..config import StereoConfig
from ..parallel.mesh import make_tile_mesh
from ..parallel.stream import build_stream_pipeline
from ..utils.timing import chained_seconds_per_call


def scaling_report(
    cfg: StereoConfig,
    image_shape: Tuple[int, int] = (375, 1242),
    device_counts: Optional[Sequence[int]] = None,
    frames_per_device: int = 1,
    tiles_per_device: Tuple[int, int] = (1, 1),
    iters: int = 10,
) -> List[dict]:
    """fps and efficiency per device count.

    Parallelization follows config 5 (BASELINE.json:11): frames shard over
    the 'batch' axis; optionally each frame also tiles over ('ty','tx')
    via ``tiles_per_device``.
    """
    devs = jax.devices()
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devs)]
    ty, tx = tiles_per_device

    rng = np.random.default_rng(0)
    rows = []
    base_fps = None
    for n in device_counts:
        batch_axis = max(1, n // (ty * tx))
        used = batch_axis * ty * tx
        mesh = make_tile_mesh(devs[:used], mesh_shape=(ty, tx), batch=batch_axis)
        batch = batch_axis * frames_per_device
        frames_l = rng.integers(0, 256, size=(batch, *image_shape)).astype(np.uint8)
        frames_r = rng.integers(0, 256, size=(batch, *image_shape)).astype(np.uint8)
        fn = build_stream_pipeline(cfg, mesh, image_shape)
        sec = chained_seconds_per_call(fn, (frames_l, frames_r), iters=iters)
        fps = batch / sec
        if base_fps is None:
            base_fps = fps / used
        eff = fps / (base_fps * used)
        rows.append({
            "devices": used,
            "batch": batch,
            "fps": round(fps, 2),
            "fps_per_device": round(fps / used, 2),
            "efficiency": round(eff, 4),
        })
    return rows
