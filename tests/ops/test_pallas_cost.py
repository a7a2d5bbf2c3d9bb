"""Pallas census cost-volume kernel vs the golden jnp implementation."""

import numpy as np
import pytest

from stereo_tpu.config import StereoConfig
from stereo_tpu.ops import census_cost_volume
from stereo_tpu.ops.pallas.cost_kernel import census_cost_volume_pallas


@pytest.mark.parametrize("shape,d", [((16, 40), 16), ((21, 50), 8), ((24, 160), 128)])
def test_cost_kernel_matches_golden(shape, d):
    rng = np.random.default_rng(d)
    left = rng.integers(0, 256, size=shape).astype(np.uint8)
    right = rng.integers(0, 256, size=shape).astype(np.uint8)
    cfg = StereoConfig(cost_fn="census", census_window=(5, 5), num_disparities=d)
    cost_p, cost_t = census_cost_volume_pallas(left, right, cfg, interpret=True)
    want = np.array(census_cost_volume(left, right, cfg))
    h, w = shape
    got = np.array(cost_p)[:h, :w]
    np.testing.assert_array_equal(got, want)
    if d >= 128:
        # transposed copy agrees on the real extent (only emitted for a
        # full 128-lane D — Mosaic cannot assemble [XC, BH, D<128] blocks)
        got_t = np.array(cost_t)[:w, :h].transpose(1, 0, 2)
        np.testing.assert_array_equal(got_t, want)
    else:
        assert cost_t is None


def test_cost_kernel_rejects_non_census():
    cfg = StereoConfig(cost_fn="sad", num_disparities=8)
    z = np.zeros((8, 16), np.uint8)
    with pytest.raises(NotImplementedError):
        census_cost_volume_pallas(z, z, cfg, interpret=True)


def test_cost_kernel_multiword_census():
    """9x7 window -> 62-bit descriptor in two uint32 words."""
    rng = np.random.default_rng(9)
    left = rng.integers(0, 256, size=(18, 40)).astype(np.uint8)
    right = rng.integers(0, 256, size=(18, 40)).astype(np.uint8)
    cfg = StereoConfig(cost_fn="census", census_window=(9, 7), num_disparities=16)
    cost_p, cost_t = census_cost_volume_pallas(left, right, cfg, interpret=True)
    want = np.array(census_cost_volume(left, right, cfg))
    np.testing.assert_array_equal(np.array(cost_p)[:18, :40], want)
    assert cost_t is None  # D=16 < 128: no transposed emit


@pytest.mark.parametrize("shape,d,win", [((16, 40), 16, (5, 5)), ((21, 50), 8, (3, 3)), ((24, 160), 128, (5, 5))])
def test_rank_kernel_matches_golden(shape, d, win):
    from stereo_tpu.ops.cost import rank_cost_volume
    from stereo_tpu.ops.pallas.cost_kernel import rank_cost_volume_pallas

    rng = np.random.default_rng(d)
    left = rng.integers(0, 256, size=shape).astype(np.uint8)
    right = rng.integers(0, 256, size=shape).astype(np.uint8)
    cfg = StereoConfig(cost_fn="rank", census_window=win, num_disparities=d)
    got, _ = rank_cost_volume_pallas(left, right, cfg, interpret=True)
    want = np.array(rank_cost_volume(left, right, cfg))
    h, w = shape
    np.testing.assert_array_equal(np.array(got)[:h, :w], want)


@pytest.mark.parametrize(
    "shape,d,win,xo",
    [
        ((16, 40), 16, (3, 3), 0),
        ((21, 50), 8, (9, 9), 0),      # window taller than the 8-row band
        ((24, 160), 128, (5, 7), 0),   # asymmetric window, full-lane D
        ((13, 37), 16, (9, 9), 5),     # column patch with a global origin
    ],
)
def test_sad_kernel_matches_golden(shape, d, win, xo):
    from stereo_tpu.ops.cost import sad_cost_volume
    from stereo_tpu.ops.pallas.cost_kernel import (
        sad_cost_volume_pallas,
        sad_kernel_supported,
    )

    rng = np.random.default_rng(d + xo)
    left = rng.integers(0, 256, size=shape).astype(np.uint8)
    right = rng.integers(0, 256, size=shape).astype(np.uint8)
    cfg = StereoConfig(
        cost_fn="sad", sad_window=win, num_disparities=d, num_paths=0,
        subpixel=False,
    )
    assert sad_kernel_supported(cfg, *shape)
    got, _ = sad_cost_volume_pallas(left, right, cfg, interpret=True, x_offset=xo)
    want = np.array(sad_cost_volume(left, right, cfg, x_offset=xo))
    h, w = shape
    np.testing.assert_array_equal(np.array(got)[:h, :w], want)


def test_sad_kernel_guards():
    """Oversized windows / tiny D fall back to the golden path."""
    from stereo_tpu.ops.pallas.cost_kernel import sad_kernel_supported

    base = StereoConfig(cost_fn="sad", num_disparities=16, num_paths=0,
                        subpixel=False)
    assert not sad_kernel_supported(base.replace(sad_window=(19, 19)), 32, 64)
    assert not sad_kernel_supported(base.replace(num_disparities=4), 32, 64)
    assert not sad_kernel_supported(base.replace(cost_fn="census"), 32, 64)
