"""Locked regression gates on the HARD synthetic suite (VERDICT r2 #1).

The earlier rounds' quality gates ran only on clean warped pairs — easy
enough that census matching is near-perfect and regressions hurting hard
content (occlusions, low texture, radiometric mismatch) would pass
silently. These thresholds were measured at this CI scale (96x160, D=16,
seeds 0-1) and locked with ~1.5-2x headroom; the same scenarios at bench
scale are recorded to bench_results/results.jsonl by bench.py --all.
"""

import numpy as np
import pytest

from stereo_tpu import PRESETS
from stereo_tpu.eval.hard_suite import (
    SCENARIOS,
    census_vs_sad_robustness,
    run_hard_suite,
)

CFG = PRESETS["kitti_sgm8_128"].replace(num_disparities=16)
SHAPE = (96, 160)
SEEDS = (0, 1)

# scenario -> (max bad3_noc, min density_noc); measured r4 with the TUNED
# kitti_sgm8_128 preset (p1=14, p2=120, 9x7 census, uniqueness .02,
# speckle 80 — VERDICT r3 #1; r5 moved presets to resolution-relative
# speckle_rel, effective 27 px at this CI scale — all gates still hold):
# clean .0035/.983, radiometric .0049/.983,
# noise .0073/.980, occlusion .0111/.969, textureless .0449/.796,
# slant .0000/.994, thin .1151/.983, jitter .0081/.974,
# periodic .0739/.918, combo .0342/.862. Gates locked ~1.3x measured
# (r3 verdict: the old 1.5-2x headroom let 50% quality regressions pass).
GATES = {
    "clean": (0.006, 0.96),
    "radiometric": (0.008, 0.96),
    "noise": (0.011, 0.96),
    "occlusion": (0.016, 0.94),
    "textureless": (0.06, 0.76),
    "slant": (0.004, 0.97),
    "thin": (0.15, 0.95),
    "jitter": (0.012, 0.94),
    "periodic": (0.10, 0.88),
    "combo": (0.05, 0.83),
}


@pytest.fixture(scope="module")
def suite_rows():
    rows = run_hard_suite(CFG, shape=SHAPE, seeds=SEEDS)
    return {r["scenario"]: r for r in rows}


def test_suite_covers_every_scenario(suite_rows):
    assert set(suite_rows) == set(SCENARIOS) == set(GATES)


@pytest.mark.parametrize("scenario", sorted(GATES))
def test_hard_scenario_gate(suite_rows, scenario):
    row = suite_rows[scenario]
    max_bad3, min_density = GATES[scenario]
    assert row["bad3_noc"] <= max_bad3, row
    assert row["density_noc"] >= min_density, row


def test_radiometric_costs_census_little(suite_rows):
    """Census is invariant to monotone per-view maps: the radiometric
    scenario must stay within ~3x of clean (it is ~1.2x today)."""
    assert (
        suite_rows["radiometric"]["bad3_noc"]
        <= 3.0 * suite_rows["clean"]["bad3_noc"] + 0.005
    )


def test_census_beats_sad_under_radiometric_distortion():
    """The measured raison-d'être gap (SURVEY.md C2): SAD collapses under
    a gain/bias/gamma mismatch; census barely moves."""
    out = census_vs_sad_robustness(CFG, shape=SHAPE, seeds=(0,))
    assert out["census"]["bad3_noc"] < 0.03, out
    assert out["sad"]["bad3_noc"] > 0.30, out
    assert out["sad"]["bad3_noc"] > 5.0 * out["census"]["bad3_noc"]


def test_occlusion_fill_on_hard_suite():
    """cfg.fill_occlusions scored against all-pixels GT (gt_valid_all):
    density goes to 1.0 and the filled estimate stays usable."""
    rows = run_hard_suite(
        CFG.replace(fill_occlusions=True),
        shape=SHAPE, seeds=(0,), scenarios=["occlusion"],
    )
    r = rows[0]
    assert r["density_all"] == 1.0
    assert r["bad3_all"] < 0.15, r
    # the non-occluded metric must not degrade vs the unfilled run
    base = run_hard_suite(
        CFG, shape=SHAPE, seeds=(0,), scenarios=["occlusion"]
    )[0]
    assert r["bad3_noc"] <= base["bad3_noc"] + 0.02


def test_gt_valid_all_supersets_gt_valid():
    from stereo_tpu.data.synthetic import make_pair

    pair = make_pair(SHAPE, max_disp=12, kind="layers", seed=3)
    assert pair.gt_valid_all is not None
    assert (pair.gt_valid_all | ~pair.gt_valid).all()  # valid ⊆ valid_all
    assert pair.gt_valid_all.sum() > pair.gt_valid.sum()  # occlusions exist


def test_quality_preset_fixes_thin_and_textureless():
    """kitti_sgm8_128_quality (adaptive P2 + gradient noise floor) must
    beat the headline preset exactly where fixed P2 cannot: thin
    structures (smoothness erases 2-4 px bars) and textureless flats.
    Measured r5 CI scale (presets now ship resolution-relative speckle,
    VERDICT r4 #1 — effective size 27 px here, not 80): thin .0447/.917,
    textureless .0329/.752."""
    cfg = PRESETS["kitti_sgm8_128_quality"].replace(num_disparities=16)
    rows = run_hard_suite(
        cfg, shape=SHAPE, seeds=SEEDS, scenarios=["thin", "textureless"]
    )
    m = {r["scenario"]: r for r in rows}
    assert m["thin"]["bad3_noc"] <= 0.06, m["thin"]
    assert m["thin"]["density_noc"] >= 0.88, m["thin"]
    assert m["textureless"]["bad3_noc"] <= 0.043, m["textureless"]
    assert m["textureless"]["density_noc"] >= 0.71, m["textureless"]
