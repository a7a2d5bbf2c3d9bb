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


@pytest.mark.parametrize("paths", [4, 8])
@pytest.mark.parametrize("lr", [True, False])
def test_fused_rect_tile_matches_masked_golden(paths, lr):
    """Pipeline dispatch on a rectangular tile of a larger frame: the
    backend="pallas_interpret" fused path (traced frame bounds) must match
    the golden masked pipeline inside the rectangle.

    The comparison excludes the D-wide right margin when the cheap LR
    re-index is active: there the golden path clamps S_R samples to the
    tile edge while the fused roll wraps — both are halo-only artifacts
    the tiling caller crops (its x_hi halo is widened by D exactly so the
    kept region never references that margin).
    """
    import jax.numpy as jnp

    from stereo_tpu.pipeline.pipeline import compute_disparity

    rng = np.random.default_rng(paths)
    h, w, d = 24, 48, 16
    left = rng.integers(0, 255, size=(h, w)).astype(np.uint8)
    right = np.roll(left, 3, axis=1)
    cfg = StereoConfig(
        num_paths=paths, p1=3, p2=20, num_disparities=d,
        subpixel=True, lr_check=lr, median_filter=False,
    )
    y0, x0, ih, iw = -4, -6, 18, 80

    got = compute_disparity(
        jnp.asarray(left), jnp.asarray(right),
        cfg.replace(backend="pallas_interpret"),
        x_offset=x0, image_width=iw, y_offset=y0, image_height=ih,
    )
    want = compute_disparity(
        jnp.asarray(left), jnp.asarray(right),
        cfg.replace(backend="jnp"),
        x_offset=x0, image_width=iw, y_offset=y0, image_height=ih,
    )

    ys = y0 + np.arange(h)[:, None]
    xs = x0 + np.arange(w)[None, :]
    rect = (ys >= 0) & (ys < ih) & (xs >= 0) & (xs < iw)
    if lr:
        rect = rect & (np.arange(w)[None, :] < w - d)
    np.testing.assert_array_equal(np.array(got.valid)[rect],
                                  np.array(want.valid)[rect])
    np.testing.assert_allclose(np.array(got.disp)[rect],
                               np.array(want.disp)[rect], atol=1e-5)


def test_fused_int8_cost_int16_acc_matches_golden():
    """int8 cost volumes (census/rank bound <= 127) with the int16 path
    accumulator: 8-path sums reach ~360 here, so any accidental int8
    accumulation overflows and fails loudly."""
    rng = np.random.default_rng(7)
    h, w, d = 24, 40, 16
    cost = rng.integers(0, 25, size=(h, w, d)).astype(np.int8)
    cfg = StereoConfig(
        num_paths=8, p1=3, p2=20, subpixel=True, lr_check=True,
        median_filter=False,
    )
    disp, valid = sgm_wta_fused_pallas(
        cost, cfg, interpret=True, acc_dtype=np.int16
    )
    g_disp, g_valid = golden(cost, cfg)
    np.testing.assert_array_equal(np.array(valid), g_valid)
    np.testing.assert_allclose(np.array(disp), g_disp, atol=1e-5)


@pytest.mark.parametrize("paths", [4, 8])
@pytest.mark.parametrize("grad_floor", [0, 12])
def test_fused_adaptive_p2_matches_golden(paths, grad_floor):
    """Adaptive P2 through the fused kernel: the per-direction effective-P2
    maps feed all passes including the fused bottom-up epilogue.

    grad_floor=12 exercises the shipped quality preset's sensor-noise
    floor through the Pallas-vs-golden path (ADVICE r4: the floor logic
    lives in two ops/sgm.py sites edited in lockstep; a divergence must
    not go uncaught)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(paths + 40)
    h, w, d = 24, 40, 16
    cost = rng.integers(0, 60, size=(h, w, d)).astype(np.int16)
    img = jnp.asarray(rng.integers(0, 255, size=(h, w)).astype(np.uint8))
    cfg = StereoConfig(
        num_disparities=d, num_paths=paths, p1=7, p2=100,
        adaptive_p2=True, p2_min=17, adaptive_grad_floor=grad_floor,
        subpixel=True, lr_check=True, median_filter=False,
    )
    disp, valid = sgm_wta_fused_pallas(cost, cfg, interpret=True, image=img)
    s = sgm_aggregate(cost.astype(np.int32), cfg, image=img)
    g_disp, g_ok, d_int = wta_with_aux(s, cfg)
    g_disp, g_ok = apply_postprocess(
        g_disp, g_ok, s, cfg.replace(median_filter=False), disp_int=d_int
    )
    np.testing.assert_array_equal(np.array(valid), np.array(g_ok))
    np.testing.assert_allclose(np.array(disp), np.array(g_disp), atol=1e-5)


def test_fused_adaptive_cp_stream_matches_golden(monkeypatch):
    """CP-stream h passes on the FUSED path (d >= 128, VERDICT r4 #2):
    bit-exact vs the golden adaptive pipeline."""
    import jax.numpy as jnp

    import stereo_tpu.ops.pallas.sgm_kernel as sk

    monkeypatch.setattr(sk, "_ADAPTIVE_CP_H", True)
    rng = np.random.default_rng(77)
    h, w, d = 16, 160, 128
    cost = rng.integers(0, 60, size=(h, w, d)).astype(np.int16)
    img = jnp.asarray(rng.integers(0, 255, size=(h, w)).astype(np.uint8))
    cfg = StereoConfig(
        num_disparities=d, num_paths=8, p1=7, p2=100,
        adaptive_p2=True, p2_min=17, adaptive_grad_floor=12,
        subpixel=True, lr_check=True, median_filter=False,
    )
    disp, valid = sgm_wta_fused_pallas(cost, cfg, interpret=True, image=img)
    s = sgm_aggregate(cost.astype(np.int32), cfg, image=img)
    g_disp, g_ok, d_int = wta_with_aux(s, cfg)
    g_disp, g_ok = apply_postprocess(
        g_disp, g_ok, s, cfg.replace(median_filter=False), disp_int=d_int
    )
    np.testing.assert_array_equal(np.array(valid), np.array(g_ok))
    np.testing.assert_allclose(np.array(disp), np.array(g_disp), atol=1e-5)


@pytest.mark.parametrize("grad_floor", [0, 12])
def test_pipeline_adaptive_p2_dispatch_matches_golden(grad_floor):
    """End-to-end adaptive-P2 config through the pallas_interpret backend
    (the pipeline threads the reference image into the fused kernels);
    grad_floor=12 covers the quality preset's noise floor (ADVICE r4)."""
    from stereo_tpu.pipeline.pipeline import compute_disparity

    rng = np.random.default_rng(9)
    h, w = 48, 144
    left = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    right = np.roll(left, 4, axis=1)
    cfg = StereoConfig(
        cost_fn="census", census_window=(5, 5), num_disparities=16,
        num_paths=8, p1=10, p2=120, adaptive_p2=True, p2_min=25,
        adaptive_grad_floor=grad_floor,
        subpixel=True, lr_check=True, median_filter=True,
    )
    fast = compute_disparity(
        left, right, cfg.replace(backend="pallas_interpret")
    )
    gold = compute_disparity(left, right, cfg.replace(backend="jnp"))
    np.testing.assert_array_equal(np.array(fast.valid), np.array(gold.valid))
    np.testing.assert_allclose(
        np.array(fast.disp), np.array(gold.disp), atol=1e-5
    )


def test_pipeline_int8_volume_dispatch_matches_golden():
    """End-to-end: a frame whose padded dims align for the int8 volume
    (_vol_dtype -> int8, cost kernel bh=32 blocking) must match the golden
    jnp pipeline bit-exactly through the pallas_interpret backend."""
    import jax.numpy as jnp

    from stereo_tpu.pipeline.pipeline import _vol_dtype, compute_disparity

    rng = np.random.default_rng(3)
    h, w = 64, 128
    left = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    right = np.roll(left, 2, axis=1)
    cfg = StereoConfig(
        cost_fn="census", census_window=(5, 5), num_disparities=128,
        num_paths=8, p1=10, p2=120, subpixel=True, lr_check=True,
        median_filter=True,
    )
    assert _vol_dtype(cfg, h, w) == jnp.int8
    fast = compute_disparity(
        left, right, cfg.replace(backend="pallas_interpret")
    )
    gold = compute_disparity(left, right, cfg.replace(backend="jnp"))
    np.testing.assert_array_equal(np.array(fast.valid), np.array(gold.valid))
    np.testing.assert_allclose(
        np.array(fast.disp), np.array(gold.disp), atol=1e-5
    )


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(subpixel=False),
        dict(uniqueness_ratio=0.05),
        dict(adaptive_p2=True, p2_min=25),
        dict(median_filter=False),
    ],
    ids=["base", "nosubpix", "uniq", "adaptive", "nomedian"],
)
def test_pipeline_lr_exact_fused_matches_golden(kw):
    """Exact-LR on the fused fast path (VERDICT r2 #5): bit-identical to
    the staged golden lr_exact pipeline end to end."""
    from stereo_tpu.pipeline.pipeline import compute_disparity

    rng = np.random.default_rng(17)
    h, w = 48, 144
    left = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    right = np.roll(left, 5, axis=1)
    cfg = StereoConfig(**{
        **dict(
            cost_fn="census", census_window=(5, 5), num_disparities=16,
            num_paths=8, p1=10, p2=120, subpixel=True, lr_check=True,
            lr_exact=True, median_filter=True,
        ),
        **kw,
    })
    fast = compute_disparity(
        left, right, cfg.replace(backend="pallas_interpret")
    )
    gold = compute_disparity(left, right, cfg.replace(backend="jnp"))
    np.testing.assert_array_equal(np.array(fast.valid), np.array(gold.valid))
    np.testing.assert_allclose(
        np.array(fast.disp), np.array(gold.disp), atol=1e-5
    )


def test_pipeline_lr_exact_reindex_matches_golden(monkeypatch):
    """The LR_EXACT_REINDEX variant (measured negative, kept for
    reproduction) stays bit-identical to the staged golden path."""
    import stereo_tpu.pipeline.pipeline as pl_mod

    monkeypatch.setattr(pl_mod, "LR_EXACT_REINDEX", True)
    rng = np.random.default_rng(17)
    h, w = 48, 144
    left = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    right = np.roll(left, 5, axis=1)
    cfg = StereoConfig(
        cost_fn="census", census_window=(5, 5), num_disparities=16,
        num_paths=8, p1=10, p2=120, subpixel=True, lr_check=True,
        lr_exact=True, median_filter=True,
    )
    fast = pl_mod.compute_disparity(
        left, right, cfg.replace(backend="pallas_interpret")
    )
    gold = pl_mod.compute_disparity(left, right, cfg.replace(backend="jnp"))
    np.testing.assert_array_equal(np.array(fast.valid), np.array(gold.valid))
    np.testing.assert_allclose(
        np.array(fast.disp), np.array(gold.disp), atol=1e-5
    )


@pytest.mark.parametrize("md", [0, 3])
def test_reindexed_right_volume_matches_flipped_pair(md):
    """reindex_right_flipped (VERDICT r4 #4): the exact-LR second pass's
    flipped right-reference volume is a BIT-EXACT re-index of the left
    volume for per-pixel descriptor costs, C_R(y,x,d) = C_L(y,x+md+d,d)
    — min_disparity included."""
    from stereo_tpu.ops.pallas.cost_kernel import census_cost_volume_pallas
    from stereo_tpu.pipeline.pipeline import reindex_right_flipped

    rng = np.random.default_rng(31)
    h, w = 40, 144
    left = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    right = np.roll(left, 5, axis=1)
    cfg = StereoConfig(cost_fn="census", census_window=(5, 5),
                       num_disparities=16, min_disparity=md)
    vol, _ = census_cost_volume_pallas(left, right, cfg, interpret=True)
    ref, _ = census_cost_volume_pallas(
        np.ascontiguousarray(np.asarray(right)[:, ::-1]),
        np.ascontiguousarray(np.asarray(left)[:, ::-1]),
        cfg, interpret=True,
    )
    got = reindex_right_flipped(vol, cfg, w, x_axis=1)
    np.testing.assert_array_equal(
        np.array(got)[:h, :w], np.array(ref)[:h, :w]
    )


def test_reindexed_right_volume_transposed_layout():
    """Same identity on the transposed [W, H, D] layout (emitted at
    D >= 128, the layout the horizontal SGM passes consume)."""
    from stereo_tpu.ops.pallas.cost_kernel import census_cost_volume_pallas
    from stereo_tpu.pipeline.pipeline import reindex_right_flipped

    rng = np.random.default_rng(32)
    h, w, d = 16, 160, 128
    left = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    right = np.roll(left, 5, axis=1)
    cfg = StereoConfig(cost_fn="census", census_window=(5, 5),
                       num_disparities=d)
    vol, vol_whd = census_cost_volume_pallas(left, right, cfg, interpret=True)
    ref, ref_whd = census_cost_volume_pallas(
        np.ascontiguousarray(np.asarray(right)[:, ::-1]),
        np.ascontiguousarray(np.asarray(left)[:, ::-1]),
        cfg, interpret=True,
    )
    assert vol_whd is not None
    got = reindex_right_flipped(vol, cfg, w, x_axis=1)
    got_t = reindex_right_flipped(vol_whd, cfg, w, x_axis=0)
    np.testing.assert_array_equal(
        np.array(got)[:h, :w], np.array(ref)[:h, :w]
    )
    np.testing.assert_array_equal(
        np.array(got_t)[:w, :h], np.array(ref_whd)[:w, :h]
    )


def test_emit_d0_packs_integer_winner():
    """emit_d0: valid output = ok + 2*d0 with d0 the golden integer
    winner (excluding min_disparity)."""
    rng = np.random.default_rng(21)
    h, w, d = 24, 40, 16
    cost = rng.integers(0, 25, size=(h, w, d)).astype(np.int16)
    cfg = StereoConfig(
        num_paths=4, p1=3, p2=20, median_filter=False, lr_check=False,
        min_disparity=2, uniqueness_ratio=0.05,
    )
    disp, packed = sgm_wta_fused_pallas(cost, cfg, interpret=True, emit_d0=True)
    s = sgm_aggregate(cost.astype(np.int32), cfg)
    g_disp, g_ok, g_dint = wta_with_aux(s, cfg)
    packed = np.array(packed)
    np.testing.assert_array_equal(packed & 1, np.array(g_ok).astype(int))
    np.testing.assert_array_equal(
        (packed >> 1) + cfg.min_disparity, np.array(g_dint)
    )
    np.testing.assert_allclose(np.array(disp), np.array(g_disp), atol=1e-5)


@pytest.mark.parametrize(
    "kw, own",
    [
        (dict(), None),
        (dict(min_disparity=3, uniqueness_ratio=0.05), None),
        (dict(), (16, 100)),
        (dict(min_disparity=2), (8, 120)),
    ],
)
def test_emit_qr_partials_match_golden(kw, own):
    """emit_qr: the packed right-view partial min, its left-spill, and the
    unpacked gate bits must each match their golden twins bit-for-bit
    (ops/postprocess.py right_view_partial_min / right_view_spill /
    lr_gate_from_right_map), including owned-source-range masking."""
    from stereo_tpu.ops.postprocess import (
        lr_gate_from_right_map,
        right_view_partial_min,
        right_view_spill,
        unpack_partial_min,
    )

    rng = np.random.default_rng(5)
    h, w, d = 16, 144, 16
    cost = rng.integers(0, 25, size=(h, w, d)).astype(np.int16)
    cfg = StereoConfig(
        num_paths=8, p1=3, p2=20, median_filter=False, lr_check=True, **kw
    )
    disp, packed, qr, spill = sgm_wta_fused_pallas(
        cost, cfg, interpret=True, emit_qr=True, qr_src=own
    )
    s = sgm_aggregate(cost.astype(np.int32), cfg)
    g_qr = right_view_partial_min(s, cfg, src=own)
    g_spill = right_view_spill(s, cfg, src=own)
    np.testing.assert_array_equal(np.array(qr), np.array(g_qr))
    np.testing.assert_array_equal(np.array(spill), np.array(g_spill))

    g_disp, g_ok, g_dint = wta_with_aux(s, cfg)
    packed = np.array(packed)
    np.testing.assert_array_equal(packed & 1, np.array(g_ok).astype(int))
    g_d0 = np.array(g_dint) - cfg.min_disparity
    np.testing.assert_array_equal(packed >> 2, g_d0)
    np.testing.assert_allclose(np.array(disp), np.array(g_disp), atol=1e-5)
    # The in-kernel LR verdict against the (own-masked) patch-local map;
    # identical to the golden gate away from the wrap region (the first
    # D + md columns, which the stitcher re-gates anyway).
    d_r = unpack_partial_min(g_qr, d)
    g_lr = np.array(
        lr_gate_from_right_map(g_d0, d_r, cfg, image_width=w)
    ).astype(int)
    cut = d + cfg.min_disparity
    np.testing.assert_array_equal(
        ((packed >> 1) & 1)[:, cut:], g_lr[:, cut:]
    )


def test_patch_parts_golden_matches_interpret():
    """compute_patch_parts: the golden and Pallas-interpret paths must emit
    bit-identical parts (except lr_bit inside the wrap region, which the
    stitcher replaces) for an interior patch with right-context and an
    owned source range."""
    from stereo_tpu.data import make_pair
    from stereo_tpu.pipeline.pipeline import compute_patch_parts

    pair = make_pair((32, 320), max_disp=12, kind="shapes", seed=9)
    cfg = StereoConfig(num_disparities=16, num_paths=8)
    f0, f1, x0, x1 = 142, 250, 160, 240
    ctx = cfg.num_disparities - 1
    left = pair.left[:, f0:f1]
    right = pair.right[:, f0 - ctx:f1]
    kw = dict(
        x_offset=f0, image_width=320, right_context=ctx,
        own=(x0 - f0, x1 - f0),
    )
    pg = compute_patch_parts(left, right, cfg, **kw)
    pi = compute_patch_parts(
        left, right, cfg.replace(backend="pallas_interpret"), **kw
    )
    for name in ("disp", "ok_nolr", "d0", "qr", "spill"):
        np.testing.assert_array_equal(
            np.array(getattr(pg, name)), np.array(getattr(pi, name)),
            err_msg=name,
        )
    cut = cfg.num_disparities + cfg.min_disparity
    np.testing.assert_array_equal(
        np.array(pg.lr_bit)[:, cut:], np.array(pi.lr_bit)[:, cut:]
    )


@pytest.mark.parametrize("adaptive", [False, True])
def test_fused_h_from_hwd_matches(adaptive):
    """h_from_hwd (horizontal passes reading the (H,W,D) volume via
    static sublane slices — no transposed volume at all) must be
    bit-identical to the default dual-layout form at D=128."""
    rng = np.random.default_rng(1)
    h, w, d = 17, 30, 128
    cost = rng.integers(0, 25, size=(h, w, d)).astype(np.int16)
    image = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    cfg = StereoConfig(
        num_disparities=d, num_paths=8, p1=10, p2=120,
        median_filter=False, adaptive_p2=adaptive, p2_min=17,
    )
    base = sgm_wta_fused_pallas(cost, cfg, interpret=True, image=image)
    alt = sgm_wta_fused_pallas(
        cost, cfg, interpret=True, image=image, h_from_hwd=True
    )
    np.testing.assert_array_equal(np.array(base[1]), np.array(alt[1]))
    np.testing.assert_array_equal(np.array(base[0]), np.array(alt[0]))


def test_fused_h_from_hwd_rejects_small_d():
    cost = np.zeros((8, 16, 16), np.int16)
    cfg = StereoConfig(num_disparities=16, num_paths=4, median_filter=False)
    with pytest.raises(ValueError):
        sgm_wta_fused_pallas(cost, cfg, interpret=True, h_from_hwd=True)
