"""Roofline instrument plumbing tests (interpret mode on CPU).

The real numbers come from the TPU run (docs/kernels.md); CI only proves
the instrument executes the production pallas_calls and emits coherent
rows (VERDICT r2 #2: the per-pass roofline replaces the hand-waved
single-number SoL fraction).
"""

from stereo_tpu import PRESETS
from stereo_tpu.eval.roofline import OPS_PER_VOX, per_pass_report


def test_per_pass_report_rows():
    cfg = PRESETS["kitti_sgm8_128"].replace(num_disparities=16)
    rows = per_pass_report(
        cfg, shape=(48, 96), iters=2, vpu_peak=1e12, interpret=True
    )
    names = [r["pass"] for r in rows]
    # D=16 < 128: the XLA transpose between the pass families lands in
    # the v_down prefix difference, and the row says so (round-3 review).
    assert names == [
        "cost", "h_fwd", "h_rev", "v_down+xla_transpose", "v_up_fused",
        "TOTAL(chain)",
    ]
    for r in rows[:-1]:
        assert r["bytes_mb"] > 0
        assert r["gops"] >= 0
        assert r["binding"] in ("vpu", "hbm")
        assert r["hbm_bound_ms"] > 0
    # every SGM pass touches at least the cost volume + S once; the bytes
    # model must be monotone with the pass's traffic structure
    by = {r["pass"]: r for r in rows[:-1]}
    assert by["h_rev"]["bytes_mb"] > by["h_fwd"]["bytes_mb"]
    # small-D v_down row also carries the modeled transpose round trip
    assert by["v_down+xla_transpose"]["bytes_mb"] > by["h_rev"]["bytes_mb"]


def test_ops_table_covers_every_pass():
    assert set(OPS_PER_VOX) == {"cost", "h_fwd", "h_rev", "v_down",
                                "v_up_fused"}
    assert OPS_PER_VOX["v_up_fused"] > OPS_PER_VOX["v_down"] > (
        OPS_PER_VOX["h_fwd"]
    )


def test_per_pass_report_adaptive_rows():
    """Adaptive-P2 accounting (VERDICT r3 #4): the chain rows run the
    adaptive kernels and an extra row prices the XLA map precompute."""
    cfg = PRESETS["kitti_sgm8_128"].replace(
        num_disparities=16, adaptive_p2=True, p2_min=17
    )
    rows = per_pass_report(
        cfg, shape=(48, 96), iters=2, vpu_peak=1e12, interpret=True
    )
    names = [r["pass"] for r in rows]
    assert names == [
        "cost", "h_fwd", "h_rev", "v_down+xla_transpose", "v_up_fused",
        "adaptive_maps_xla", "TOTAL(chain)",
    ]
    maps_row = rows[-2]
    assert maps_row["ms"] > 0
    assert maps_row["bytes_mb"] > 0
    assert rows[-1]["adaptive_p2"] is True
