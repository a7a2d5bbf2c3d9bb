"""Cost-volume golden tests against naive numpy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from stereo_tpu.config import StereoConfig
from stereo_tpu.ops import box_sum, census_cost_volume, cost_volume, sad_cost_volume
from stereo_tpu.ops.census import census_transform


def test_box_sum_matches_naive():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 50, size=(11, 13)).astype(np.int32)
    wy, wx = 3, 5
    got = np.array(box_sum(img, (wy, wx)))
    p = np.pad(img, ((wy // 2, wy // 2), (wx // 2, wx // 2)), mode="edge")
    want = np.zeros_like(img)
    for y in range(img.shape[0]):
        for x in range(img.shape[1]):
            want[y, x] = p[y : y + wy, x : x + wx].sum()
    np.testing.assert_array_equal(got, want)


def test_box_sum_3d():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 10, size=(8, 9, 4)).astype(np.int32)
    got = np.array(box_sum(x, (3, 3)))
    for c in range(4):
        ref = np.array(box_sum(x[:, :, c], (3, 3)))
        np.testing.assert_array_equal(got[:, :, c], ref)


def naive_sad(left, right, cfg):
    h, w = left.shape
    d_max = cfg.num_disparities
    wy, wx = cfg.sad_window
    area = wy * wx
    out = np.zeros((h, w, d_max), dtype=np.int32)
    for d in range(d_max):
        shifted = np.empty_like(right, dtype=np.int64)
        for x in range(w):
            shifted[:, x] = right[:, max(x - d, 0)]
        ad = np.abs(left.astype(np.int64) - shifted)
        p = np.pad(ad, ((wy // 2, wy // 2), (wx // 2, wx // 2)), mode="edge")
        for y in range(h):
            for x in range(w):
                s = p[y : y + wy, x : x + wx].sum() // area
                out[y, x, d] = cfg.max_unary_cost if x < d else s
    return out


def test_sad_cost_volume_matches_naive():
    rng = np.random.default_rng(2)
    left = rng.integers(0, 256, size=(9, 14)).astype(np.uint8)
    right = rng.integers(0, 256, size=(9, 14)).astype(np.uint8)
    cfg = StereoConfig(cost_fn="sad", sad_window=(3, 3), num_disparities=5)
    got = np.array(sad_cost_volume(left, right, cfg))
    want = naive_sad(left, right, cfg)
    np.testing.assert_array_equal(got, want)


def test_census_cost_volume_matches_naive():
    rng = np.random.default_rng(3)
    left = rng.integers(0, 256, size=(10, 12)).astype(np.uint8)
    right = rng.integers(0, 256, size=(10, 12)).astype(np.uint8)
    cfg = StereoConfig(cost_fn="census", census_window=(3, 3), num_disparities=4)
    got = np.array(census_cost_volume(left, right, cfg))

    cl = np.array(census_transform(left, (3, 3)))
    cr = np.array(census_transform(right, (3, 3)))
    h, w = left.shape
    want = np.zeros((h, w, 4), dtype=np.int32)
    for y in range(h):
        for x in range(w):
            for d in range(4):
                if x < d:
                    want[y, x, d] = cfg.max_unary_cost
                else:
                    xor = np.bitwise_xor(cl[y, x], cr[y, x - d])
                    want[y, x, d] = sum(bin(int(v)).count("1") for v in xor)
    np.testing.assert_array_equal(got, want)


def test_zero_disparity_identical_images():
    """Identical images: d=0 cost must be 0 everywhere (census)."""
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(8, 10)).astype(np.uint8)
    cfg = StereoConfig(cost_fn="census", num_disparities=4)
    vol = np.array(cost_volume(img, img, cfg))
    np.testing.assert_array_equal(vol[:, :, 0], 0)


def test_rank_cost_volume_matches_naive():
    from stereo_tpu.ops.cost import rank_cost_volume

    rng = np.random.default_rng(5)
    left = rng.integers(0, 256, size=(9, 12)).astype(np.uint8)
    right = rng.integers(0, 256, size=(9, 12)).astype(np.uint8)
    cfg = StereoConfig(cost_fn="rank", census_window=(3, 3), num_disparities=4)
    got = np.array(rank_cost_volume(left, right, cfg))

    def rank(img):
        p = np.pad(img.astype(np.int64), 1, mode="edge")
        out = np.zeros(img.shape, np.int64)
        for y in range(img.shape[0]):
            for x in range(img.shape[1]):
                win = p[y : y + 3, x : x + 3]
                out[y, x] = (win < img[y, x]).sum()
        return out

    rl, rr = rank(left), rank(right)
    h, w = left.shape
    for y in range(h):
        for x in range(w):
            for d in range(4):
                want = (
                    cfg.max_unary_cost
                    if x < d
                    else abs(rl[y, x] - rr[y, x - d])
                )
                assert got[y, x, d] == want, (y, x, d)


def test_rank_pipeline_end_to_end():
    from stereo_tpu import compute_disparity
    from stereo_tpu.data import make_pair
    from stereo_tpu.eval import evaluate_disparity

    pair = make_pair((64, 96), max_disp=10, kind="constant", seed=8)
    cfg = StereoConfig(cost_fn="rank", num_disparities=16, num_paths=4,
                       subpixel=False, median_filter=False)
    res = compute_disparity(pair.left, pair.right, cfg)
    m = evaluate_disparity(
        np.array(res.disp), pair.gt_disp, pair.gt_valid, np.array(res.valid)
    )
    assert m["bad1"] < 0.01, m


def test_min_disparity_shifts_search_range():
    """Regression (round-3 review): the volume previously IGNORED
    min_disparity (search always ran d = 0..D-1 and the winner was
    relabeled +md, biasing every md != 0 output by md). Lane d must
    search disparity md + d: a random-dot pair with constant true
    disparity c recovers exactly c when c is inside [md, md + D)."""
    rng = np.random.default_rng(3)
    h, w, c, md = 20, 96, 9, 4
    right = rng.integers(0, 255, (h, w)).astype(np.uint8)
    idx = np.maximum(np.arange(w) - c, 0)
    left = right[:, idx]
    cfg = StereoConfig(
        cost_fn="census", census_window=(5, 5), num_disparities=16,
        min_disparity=md, num_paths=0, subpixel=False, lr_check=False,
        median_filter=False, uniqueness_ratio=0.0,
    )
    vol = np.array(cost_volume(jnp.asarray(left), jnp.asarray(right), cfg))
    win = md + vol.argmin(axis=2)
    interior = np.zeros((h, w), bool)
    interior[4:-4, max(c, md + 15) + 4:-4] = True
    assert (win[interior] == c).mean() > 0.99, win[interior]


def test_min_disparity_volume_matches_shifted_zero_md():
    """vol_md[x, l] must equal vol_0[x, l'] at l' = l + md wherever both
    lanes exist (same disparity, same costs)."""
    rng = np.random.default_rng(4)
    h, w = 16, 64
    left = rng.integers(0, 255, (h, w)).astype(np.uint8)
    right = rng.integers(0, 255, (h, w)).astype(np.uint8)
    cfg0 = StereoConfig(cost_fn="census", census_window=(5, 5),
                        num_disparities=16, num_paths=0)
    cfg3 = cfg0.replace(num_disparities=8, min_disparity=3)
    v0 = np.array(cost_volume(jnp.asarray(left), jnp.asarray(right), cfg0))
    v3 = np.array(cost_volume(jnp.asarray(left), jnp.asarray(right), cfg3))
    np.testing.assert_array_equal(v3, v0[:, :, 3:11])
