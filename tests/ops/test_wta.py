"""WTA selection, subpixel refinement, and uniqueness tests."""

import numpy as np

from stereo_tpu.config import StereoConfig
from stereo_tpu.ops import wta_disparity


def test_wta_argmin():
    rng = np.random.default_rng(0)
    s = rng.integers(0, 1000, size=(6, 7, 9)).astype(np.int32)
    cfg = StereoConfig(subpixel=False, uniqueness_ratio=0.0)
    disp, valid = wta_disparity(s, cfg)
    np.testing.assert_array_equal(np.array(disp), np.argmin(s, axis=-1))
    assert bool(np.array(valid).all())


def test_subpixel_recovers_parabola_vertex():
    """Costs sampled from (d - d*)^2 must refine to d* exactly."""
    d_star = 4.3
    ds = np.arange(8, dtype=np.float32)
    cost_1d = ((ds - d_star) ** 2 * 100).astype(np.int32)
    s = np.broadcast_to(cost_1d, (3, 3, 8)).copy()
    cfg = StereoConfig(subpixel=True)
    disp, _ = wta_disparity(s, cfg)
    np.testing.assert_allclose(np.array(disp), d_star, atol=1e-2)


def test_subpixel_noop_at_volume_edges():
    """Winner at d=0 or d=D-1 must not be refined (no bracket)."""
    s = np.tile(np.arange(5, dtype=np.int32), (2, 2, 1))  # min at d=0
    cfg = StereoConfig(subpixel=True)
    disp, _ = wta_disparity(s, cfg)
    np.testing.assert_array_equal(np.array(disp), 0.0)


def test_uniqueness_rejects_flat_volume():
    s = np.full((4, 4, 8), 100, dtype=np.int32)
    cfg = StereoConfig(subpixel=False, uniqueness_ratio=0.1)
    _, valid = wta_disparity(s, cfg)
    assert not bool(np.array(valid).any())


def test_uniqueness_keeps_sharp_minimum():
    s = np.full((4, 4, 8), 1000, dtype=np.int32)
    s[:, :, 3] = 10
    cfg = StereoConfig(subpixel=False, uniqueness_ratio=0.1)
    disp, valid = wta_disparity(s, cfg)
    assert bool(np.array(valid).all())
    np.testing.assert_array_equal(np.array(disp), 3.0)


def test_min_disparity_offset():
    s = np.full((2, 2, 4), 50, dtype=np.int32)
    s[:, :, 2] = 1
    cfg = StereoConfig(subpixel=False, min_disparity=10)
    disp, _ = wta_disparity(s, cfg)
    np.testing.assert_array_equal(np.array(disp), 12.0)
