"""Worker for the 2-process distributed test (SURVEY.md §4.3).

Each process brings up jax.distributed against a localhost coordinator,
contributes 4 fake CPU devices, and runs the exact-mode pipeline over the
global 8-device mesh; process 0 writes the result for comparison against
the single-process golden output.

Usage: python mp_worker.py <pid> <nprocs> <port> <outdir>
"""

import os
import sys

pid, nprocs, port, outdir = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nprocs,
    process_id=pid,
)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from stereo_tpu import StereoConfig  # noqa: E402
from stereo_tpu.data import make_pair  # noqa: E402
from stereo_tpu.parallel import build_exact_pipeline, make_tile_mesh  # noqa: E402

assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == 4 * nprocs, jax.devices()

pair = make_pair((48, 64), max_disp=8, kind="shapes", seed=7)
cfg = StereoConfig(num_disparities=8, num_paths=4, subpixel=False)
mesh = make_tile_mesh(jax.devices(), mesh_shape=(4, 2))
fn = build_exact_pipeline(cfg, mesh)
res = fn(pair.left, pair.right)
disp = np.asarray(jax.device_get(res.disp))

if pid == 0:
    np.save(os.path.join(outdir, "mp_disp.npy"), disp)
print(f"proc {pid}: ok", flush=True)
