"""Two-process localhost distributed run (DCN-path plumbing, SURVEY.md §4.3).

Spawns two Python processes that meet at a localhost coordinator, form one
8-device mesh (4 fake CPU devices each), run the exact-mode pipeline, and
must produce output identical to the single-process golden pipeline.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_exact_pipeline(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multiprocess worker timed out")
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"

    from stereo_tpu import StereoConfig, compute_disparity
    from stereo_tpu.data import make_pair

    pair = make_pair((48, 64), max_disp=8, kind="shapes", seed=7)
    cfg = StereoConfig(num_disparities=8, num_paths=4, subpixel=False)
    golden = np.array(compute_disparity(pair.left, pair.right, cfg).disp)
    got = np.load(tmp_path / "mp_disp.npy")
    np.testing.assert_array_equal(got, golden)
