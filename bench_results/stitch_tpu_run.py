"""One-off TPU measurement: config-4 column patching, stitched vs legacy.

Appends two rows to bench_results/results.jsonl (VERDICT r2 #7: measure
the halo+D overlap mitigation on hardware).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

from stereo_tpu import PRESETS, StereoConfig
from stereo_tpu.data import make_pair
from stereo_tpu.eval import evaluate_disparity
from stereo_tpu.parallel.bands import build_banded_pipeline
from stereo_tpu.utils.timing import chained_seconds_per_call

print("devices:", jax.devices(), flush=True)

# --- sanity: small stitched run on-device, compare against CPU golden ---
pair_s = make_pair((64, 512), max_disp=40, kind="shapes", seed=5)
cfg_s = StereoConfig(num_disparities=64, num_paths=8)
fn_s = build_banded_pipeline(cfg_s, (64, 512), n_bands=1, n_cols=2,
                             lr_stitch=True)
t0 = time.time()
res_s = fn_s(pair_s.left, pair_s.right)
disp_s = np.asarray(res_s.disp)
print(f"sanity stitched compile+run {time.time()-t0:.1f}s", flush=True)

cfg_g = cfg_s.replace(backend="jnp")
fn_g = build_banded_pipeline(cfg_g, (64, 512), n_bands=1, n_cols=2,
                             lr_stitch=True)
res_g = fn_g(pair_s.left, pair_s.right)
nd = (np.abs(disp_s - np.asarray(res_g.disp)) > 1e-4).mean()
nv = (np.asarray(res_s.valid) != np.asarray(res_g.valid)).mean()
print(f"sanity: TPU-pallas vs golden disp diff {nd:.6f} valid diff {nv:.6f}",
      flush=True)
assert nd == 0.0 and nv == 0.0, (nd, nv)

# --- config 4 ---
shape4 = (1988, 2880)
cfg4 = PRESETS["middlebury_full_256_tiled"]
pair4 = make_pair(shape4, max_disp=200, kind="shapes", texture="cloud",
                  seed=0)
sha = os.popen("cd /root/repo && git rev-parse --short HEAD").read().strip()

rows = []
for mode, stitch in (("stitched", True), ("legacy", False)):
    t0 = time.time()
    fn4 = build_banded_pipeline(cfg4, shape4, n_bands=1, n_cols=2,
                                lr_stitch=stitch)
    sec4 = chained_seconds_per_call(
        lambda l, r: fn4(l, r), (pair4.left, pair4.right), iters=15
    )
    res4 = fn4(pair4.left, pair4.right)
    q4 = evaluate_disparity(
        np.asarray(res4.disp), pair4.gt_disp, pair4.gt_valid,
        np.asarray(res4.valid),
    )
    rec = {
        "metric": "middlebury_full_256_patched_fps_per_chip",
        "value": round(1.0 / sec4, 3),
        "unit": "fps",
        "shape": list(shape4),
        "num_disparities": 256,
        "num_paths": 8,
        "sec_per_frame": round(sec4, 6),
        "bad3": round(q4["bad3"], 5),
        "epe": round(q4["epe"], 5),
        "density": round(q4["density"], 5),
        "device": str(jax.devices()[0]),
        "git_sha": sha,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "note": f"1x2 column patches, {mode} LR regime "
                f"({'warm-up-only overlap + qr stitch' if stitch else 'halo+D x-halos'})",
    }
    rows.append(rec)
    print(json.dumps(rec), flush=True)
    print(f"{mode}: total wall {time.time()-t0:.1f}s", flush=True)

with open("/root/repo/bench_results/results.jsonl", "a") as f:
    for rec in rows:
        f.write(json.dumps(rec) + "\n")
print("DONE", flush=True)
