"""SGM aggregation golden tests against a naive per-pixel numpy oracle."""

import numpy as np
import pytest

from stereo_tpu.config import StereoConfig
from stereo_tpu.ops import sgm_aggregate
from stereo_tpu.ops.sgm import _shear, _unshear

INF = 10**9

DIRS4 = [(0, 1), (0, -1), (1, 0), (-1, 0)]
DIRS8 = DIRS4 + [(1, 1), (-1, -1), (1, -1), (-1, 1)]


def naive_sgm(cost, cfg, image=None):
    """Per-pixel dynamic programming, literal Hirschmueller recurrence."""
    h, w, nd = cost.shape
    dirs = DIRS4 if cfg.num_paths == 4 else DIRS8
    s = np.zeros_like(cost, dtype=np.int64)
    for dy, dx in dirs:
        l = np.zeros_like(cost, dtype=np.int64)
        ys = range(h) if dy >= 0 else range(h - 1, -1, -1)
        for y in ys:
            xs = range(w) if dx >= 0 else range(w - 1, -1, -1)
            for x in xs:
                py, px = y - dy, x - dx
                if 0 <= py < h and 0 <= px < w:
                    lp = l[py, px]
                    m = lp.min()
                    if cfg.adaptive_p2 and image is not None:
                        grad = abs(int(image[y, x]) - int(image[py, px]))
                        p2 = (
                            max(cfg.p2_min, cfg.p2 // grad)
                            if grad > 0
                            else cfg.p2
                        )
                    else:
                        p2 = cfg.p2
                    for d in range(nd):
                        cand = min(
                            lp[d],
                            m + p2,
                            lp[d - 1] + cfg.p1 if d > 0 else INF,
                            lp[d + 1] + cfg.p1 if d < nd - 1 else INF,
                        )
                        l[y, x, d] = cost[y, x, d] + cand - m
                else:
                    l[y, x] = cost[y, x]
            # NOTE: horizontal paths need x-inner iteration; vertical and
            # diagonal paths need the row-by-row order used here. Both are
            # satisfied because predecessors always lie in a previously
            # finished row or earlier in the current row.
        s += l
    return s


@pytest.mark.parametrize("paths", [4, 8])
def test_sgm_matches_naive(paths):
    rng = np.random.default_rng(paths)
    cost = rng.integers(0, 25, size=(9, 11, 6)).astype(np.int32)
    cfg = StereoConfig(num_paths=paths, p1=3, p2=20)
    got = np.array(sgm_aggregate(cost, cfg))
    want = naive_sgm(cost, cfg)
    np.testing.assert_array_equal(got, want)


def test_sgm_adaptive_p2_matches_naive():
    rng = np.random.default_rng(7)
    cost = rng.integers(0, 25, size=(7, 9, 5)).astype(np.int32)
    image = rng.integers(0, 256, size=(7, 9)).astype(np.uint8)
    cfg = StereoConfig(num_paths=8, p1=3, p2=40, adaptive_p2=True, p2_min=10)
    got = np.array(sgm_aggregate(cost, cfg, image=image))
    want = naive_sgm(cost, cfg, image=image)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("paths", [4, 8])
def test_sgm_zero_penalties_is_wta(paths):
    """P1 = P2 = 0 makes every path cost equal the raw cost (SURVEY.md §4.1)."""
    rng = np.random.default_rng(1)
    cost = rng.integers(0, 30, size=(6, 8, 4)).astype(np.int32)
    cfg = StereoConfig(num_paths=paths, p1=0, p2=0)
    s = np.array(sgm_aggregate(cost, cfg))
    np.testing.assert_array_equal(s, cost * paths)


def test_sgm_d1_volume():
    """D=1: min over d is the value itself, recurrence degenerates to cost."""
    rng = np.random.default_rng(2)
    cost = rng.integers(0, 30, size=(5, 7, 1)).astype(np.int32)
    cfg = StereoConfig(num_paths=4, p1=5, p2=9)
    s = np.array(sgm_aggregate(cost, cfg))
    np.testing.assert_array_equal(s, cost * 4)


def test_sgm_respects_validity_mask():
    """Masked-out border rows must not leak state into valid pixels."""
    rng = np.random.default_rng(3)
    h, w, nd = 8, 10, 4
    cost_full = rng.integers(0, 25, size=(h, w, nd)).astype(np.int32)
    cfg = StereoConfig(num_paths=4, p1=3, p2=20)

    # Run on the interior only vs run on full with mask marking the border
    # invalid; interior results must match exactly.
    interior = np.s_[2 : h - 2, 3 : w - 3]
    want = naive_sgm(cost_full[interior], cfg)

    valid = np.zeros((h, w), dtype=bool)
    valid[interior] = True
    got = np.array(
        sgm_aggregate(np.array(cost_full), cfg, valid=np.array(valid))
    )[interior]
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("sign", [+1, -1])
def test_shear_roundtrip(sign):
    rng = np.random.default_rng(4)
    x = rng.integers(0, 100, size=(6, 9, 3)).astype(np.int32)
    sheared, valid = _shear(x, sign)
    back = np.array(_unshear(sheared, sign, x.shape[1]))
    np.testing.assert_array_equal(back, x)
    assert int(np.array(valid).sum()) == 6 * 9
