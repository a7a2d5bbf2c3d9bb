"""Model-zoo tests: every family builds, runs, and meets quality gates."""

import numpy as np
import pytest

from stereo_tpu import StereoConfig
from stereo_tpu.data import make_pair
from stereo_tpu.eval import evaluate_disparity
from stereo_tpu.models import MODELS, get_model


CFG = StereoConfig(cost_fn="census", num_disparities=32, num_paths=4)


def _quality(model, pair):
    fn = model.build()
    res = fn(pair.left, pair.right)
    return evaluate_disparity(
        np.array(res.disp), pair.gt_disp, pair.gt_valid, np.array(res.valid)
    )


def test_registry_lists_all():
    assert set(MODELS) == {"classic", "block_matching", "pyramid"}


def test_classic_model():
    pair = make_pair((96, 160), max_disp=24, kind="shapes", seed=0)
    m = _quality(get_model("classic", cfg=CFG), pair)
    assert m["bad3"] < 0.02, m


def test_block_matching_model():
    pair = make_pair((96, 160), max_disp=24, kind="shapes", seed=1)
    cfg = StereoConfig(cost_fn="sad", num_disparities=32, subpixel=False)
    m = _quality(get_model("block_matching", cfg=cfg), pair)
    assert m["bad3"] < 0.05, m


def test_pyramid_model_quality():
    # The pyramid family trades accuracy at discontinuities for ~D/R less
    # work (see models/pyramid.py); the gate reflects that documented trade
    # on this discontinuity-heavy synthetic scene.
    pair = make_pair((96, 160), max_disp=24, kind="shapes", seed=2)
    m = _quality(get_model("pyramid", cfg=CFG, residual_range=16), pair)
    assert m["bad3"] < 0.10, m
    assert m["density"] > 0.85, m


def test_pyramid_smooth_scene_near_exact():
    """On smooth disparity fields the pyramid matches classic closely."""
    pair = make_pair((96, 160), max_disp=24, kind="slant", seed=9)
    m = _quality(get_model("pyramid", cfg=CFG, residual_range=16), pair)
    assert m["bad3"] < 0.01, m


def test_pyramid_tracks_classic():
    """Pyramid must stay within a few x of classic's error on easy scenes."""
    pair = make_pair((96, 160), max_disp=20, kind="steps", seed=3)
    mc = _quality(get_model("classic", cfg=CFG), pair)
    mp = _quality(get_model("pyramid", cfg=CFG), pair)
    assert mp["bad3"] <= max(0.05, 6 * mc["bad3"] + 0.02), (mc, mp)


def test_model_describe():
    d = get_model("pyramid", cfg=CFG).describe()
    assert d["model"] == "pyramid" and d["D"] == 32


def test_pyramid_mxu_gather_matches_take_along_axis():
    """The one-hot-matmul residual volume (TPU path) must be bit-identical
    to the take_along_axis construction, including frame-edge clipping and
    bases larger than x (index underflow) or near the right edge
    (index overflow into the edge-padded strip)."""
    import jax.numpy as jnp

    from stereo_tpu.models.pyramid import _residual_cost_volume
    from stereo_tpu.ops import census_transform

    rng = np.random.default_rng(11)
    h, w, r = 16, 64, 8
    left = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    right = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    cl = census_transform(jnp.asarray(left), (7, 9))   # 62 bits -> 2 words
    cr = census_transform(jnp.asarray(right), (7, 9))
    # base >= 0 (the documented precondition; the model clamps)
    base = rng.integers(0, 70, size=(h, w)).astype(np.int32)
    gather = _residual_cost_volume(cl, cr, jnp.asarray(base), r // 2, r, False)
    mxu = _residual_cost_volume(cl, cr, jnp.asarray(base), r // 2, r, True)
    np.testing.assert_array_equal(np.array(gather), np.array(mxu))


def test_pyramid_mxu_row_banding_bit_exact(monkeypatch):
    """The banded one-hot einsum (ADVICE r1: bound the select operand) must
    stay bit-identical when the budget forces multiple bands, including a
    ragged final band (h not a band multiple)."""
    import jax.numpy as jnp

    from stereo_tpu.models import pyramid
    from stereo_tpu.ops import census_transform

    rng = np.random.default_rng(12)
    h, w, r = 13, 48, 8
    left = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    right = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    cl = census_transform(jnp.asarray(left), (5, 5))
    cr = census_transform(jnp.asarray(right), (5, 5))
    base = jnp.asarray(rng.integers(0, 50, size=(h, w)).astype(np.int32))
    gather = pyramid._residual_cost_volume(cl, cr, base, r // 2, r, False)
    # w=48 pads to wpp=128: 48*128*2 B/row; 4 rows/band -> 4 bands, last
    # band ragged (13 = 3*4 + 1).
    monkeypatch.setattr(pyramid, "_ONEHOT_BUDGET_BYTES", 4 * 48 * 128 * 2)
    mxu = pyramid._residual_cost_volume(cl, cr, base, r // 2, r, True)
    np.testing.assert_array_equal(np.array(gather), np.array(mxu))
