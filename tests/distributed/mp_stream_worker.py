"""Worker for the 2-process kill/restart stream test (SURVEY.md §5
failure detection: "kills one process mid-stream in the 2-process
localhost test to verify clean restart").

Each process contributes 2 fake CPU devices to a (batch=4, ty=1, tx=1)
mesh and drives the SAME frame stream through a StreamRunner with a
per-process manifest. With ``fail_after`` set, the runner's fault
injection fires after that many frames: process 1 dies hard
(os._exit — no cleanup, the "killed worker"), process 0 records its
progress and exits nonzero (in a real SPMD job the coordinator tears
the survivors down). On restart without ``fail_after``, both processes
resume from their manifests and must finish the remaining frames.

Every process writes, per run: the GLOBAL frame ids its addressable
output shards covered (ids_run<r>_p<pid>.json) and the disparity maps
for those frames (disp_run<r>_p<pid>.npz) — the test asserts the union
over runs and processes covers every frame exactly once and matches the
single-process pipeline bit-for-bit.

Usage: python mp_stream_worker.py <pid> <nprocs> <port> <outdir> <run_id>
       <fail_after|none>
"""

import json
import os
import sys

pid, nprocs, port, outdir, run_id = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
    int(sys.argv[5]),
)
fail_after = None if sys.argv[6] == "none" else int(sys.argv[6])

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
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
from stereo_tpu.parallel import StreamRunner, make_tile_mesh  # noqa: E402

N_FRAMES = 12
BATCH = 4
cfg = StereoConfig(num_disparities=8, num_paths=4, subpixel=False)
pairs = [
    make_pair((48, 64), max_disp=6, kind="shapes", seed=s)
    for s in range(N_FRAMES)
]
frames = [(p.left, p.right) for p in pairs]

mesh = make_tile_mesh(jax.devices(), mesh_shape=(1, 1), batch=BATCH)
runner = StreamRunner(
    cfg, mesh, (48, 64), batch_size=BATCH,
    manifest_path=os.path.join(outdir, f"manifest_p{pid}.json"),
)

ids, disps = [], {}
seen = [runner.frames_done]  # global id of the next frame to drain


def on_result(res):
    base = seen[0]
    for s in res.disp.addressable_shards:
        for j in range(s.index[0].start, s.index[0].stop):
            fid = base + j
            if fid < N_FRAMES:
                ids.append(fid)
                disps[str(fid)] = np.asarray(
                    s.data[j - s.index[0].start]
                )
    seen[0] = base + res.disp.shape[0]


def save():
    with open(os.path.join(outdir, f"ids_run{run_id}_p{pid}.json"), "w") as f:
        json.dump(sorted(ids), f)
    np.savez(os.path.join(outdir, f"disp_run{run_id}_p{pid}.npz"), **disps)


try:
    stats = runner.run(frames, on_result=on_result, checkpoint_every=BATCH,
                       fail_after=fail_after)
except RuntimeError as e:
    if "fault injection" not in str(e):
        raise
    if pid == 1:
        # The "killed" worker: record what on_result already delivered
        # downstream (those frames were drained before the fault), then
        # die hard — os._exit skips every interpreter/distributed-runtime
        # cleanup path, like a SIGKILLed process.
        save()
        os._exit(1)
    save()
    print(f"proc {pid}: died after fault injection", flush=True)
    sys.exit(3)

save()
print(f"proc {pid}: ok frames={stats['frames']}", flush=True)
