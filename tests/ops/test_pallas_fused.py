"""Fused SGM+WTA+LR Pallas kernel vs the golden staged pipeline."""

import numpy as np
import pytest

from stereo_tpu.config import StereoConfig
from stereo_tpu.ops import apply_postprocess, sgm_aggregate
from stereo_tpu.ops.pallas.sgm_kernel import sgm_wta_fused_pallas
from stereo_tpu.ops.wta import wta_with_aux


def golden(cost, cfg):
    s = sgm_aggregate(cost.astype(np.int32), cfg)
    disp, ok, d_int = wta_with_aux(s, cfg)
    cfg_nomed = cfg.replace(median_filter=False)
    disp, ok = apply_postprocess(disp, ok, s, cfg_nomed, disp_int=d_int)
    return np.array(disp), np.array(ok)


@pytest.mark.parametrize("paths", [4, 8])
@pytest.mark.parametrize(
    "kw",
    [
        dict(subpixel=True, lr_check=True),
        dict(subpixel=False, lr_check=True),
        dict(subpixel=True, lr_check=False),
        dict(subpixel=True, lr_check=True, uniqueness_ratio=0.05),
        dict(subpixel=True, lr_check=True, min_disparity=3),
    ],
)
def test_fused_matches_golden(paths, kw):
    rng = np.random.default_rng(paths)
    h, w, d = 24, 40, 16
    cost = rng.integers(0, 25, size=(h, w, d)).astype(np.int16)
    cfg = StereoConfig(
        num_paths=paths, p1=3, p2=20, median_filter=False, **kw
    )
    disp, valid = sgm_wta_fused_pallas(cost, cfg, interpret=True)
    g_disp, g_valid = golden(cost, cfg)
    np.testing.assert_array_equal(np.array(valid), g_valid)
    np.testing.assert_allclose(np.array(disp), g_disp, atol=1e-5)


def test_fused_row_padding_and_d128():
    rng = np.random.default_rng(0)
    cost = rng.integers(0, 25, size=(21, 33, 128)).astype(np.int16)
    cfg = StereoConfig(num_paths=8, p1=10, p2=120, median_filter=False)
    disp, valid = sgm_wta_fused_pallas(cost, cfg, interpret=True)
    g_disp, g_valid = golden(cost, cfg)
    np.testing.assert_array_equal(np.array(valid), g_valid)
    np.testing.assert_allclose(np.array(disp), g_disp, atol=1e-5)


def test_epilogue_shift_compiled_matches_gather():
    """The bit-decomposed static-roll path (compiled kernels) must agree
    with the take_along_axis formulation (interpret path) — both are pure
    jnp and runnable on CPU."""
    from stereo_tpu.ops.pallas.sgm_kernel import _epilogue_shift

    rng = np.random.default_rng(0)
    wp, d = 48, 16
    mat = rng.normal(size=(wp, d)).astype(np.float32)
    for sign in (1, -1):
        for base in (0, 3):
            a = np.array(_epilogue_shift(mat, base, wp, True, sign))
            b = np.array(_epilogue_shift(mat, base, wp, False, sign))
            np.testing.assert_array_equal(a, b)
