"""Pallas census cost-volume kernel vs the golden jnp implementation."""

import jax.numpy as jnp
import numpy as np
import pytest

from stereo_tpu.config import StereoConfig
from stereo_tpu.ops import census_cost_volume
from stereo_tpu.ops.cost import sad_cost_volume
from stereo_tpu.ops.pallas.cost_kernel import (
    census_cost_volume_pallas,
    sad_cost_volume_pallas,
)


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


# ---------------------------------------------------------------------------
# right_context: frame-true left context for column patches (VERDICT r2 #7 —
# removes the +D left x-halo from parallel/bands.py).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ctx_kind", ["full", "short", "unaligned"])
def test_cost_kernel_right_context_bit_exact(ctx_kind):
    """Kernel with context == golden with the same context, bit for bit."""
    rng = np.random.default_rng(7)
    h, w = 24, 256
    d = 128
    cfg = StereoConfig(cost_fn="census", census_window=(5, 5), num_disparities=d)
    x0 = 300
    ctx = {"full": d + 1, "short": 37, "unaligned": 150}[ctx_kind]
    left = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    right = rng.integers(0, 256, size=(h, w + ctx)).astype(np.uint8)
    want = np.array(
        census_cost_volume(left, right, cfg, x_offset=x0, right_context=ctx)
    )
    got, got_t = census_cost_volume_pallas(
        left, right, cfg, interpret=True, x_offset=x0, right_context=ctx
    )
    np.testing.assert_array_equal(np.array(got)[:h, :w], want)
    np.testing.assert_array_equal(
        np.array(got_t)[:w, :h].transpose(1, 0, 2), want
    )


def test_right_context_is_frame_exact_in_interior():
    """A column patch with context >= D-1+radius reproduces the whole-frame
    volume everywhere except the window-clamped patch edge columns (which
    the banded runner's warm-up halo absorbs)."""
    rng = np.random.default_rng(11)
    H, W = 30, 520
    cfg = StereoConfig(cost_fn="census", census_window=(5, 5), num_disparities=128)
    left = rng.integers(0, 256, size=(H, W)).astype(np.uint8)
    right = rng.integers(0, 256, size=(H, W)).astype(np.uint8)
    full = np.array(census_cost_volume(left, right, cfg))
    x0, x1, r = 256, 512, 2
    ctx = cfg.num_disparities - 1 + r
    patch = np.array(
        census_cost_volume(
            left[:, x0:x1], right[:, x0 - ctx : x1], cfg,
            x_offset=x0, right_context=ctx,
        )
    )
    np.testing.assert_array_equal(
        patch[:, r : x1 - x0 - r], full[:, x0 + r : x1 - r]
    )


def test_rank_kernel_right_context_bit_exact():
    from stereo_tpu.ops.cost import rank_cost_volume
    from stereo_tpu.ops.pallas.cost_kernel import rank_cost_volume_pallas

    rng = np.random.default_rng(3)
    h, w, d, ctx = 16, 128, 128, 130
    cfg = StereoConfig(cost_fn="rank", census_window=(5, 5), num_disparities=d)
    left = rng.integers(0, 256, size=(h, w)).astype(np.uint8)
    right = rng.integers(0, 256, size=(h, w + ctx)).astype(np.uint8)
    want = np.array(
        rank_cost_volume(left, right, cfg, x_offset=200, right_context=ctx)
    )
    got, _ = rank_cost_volume_pallas(
        left, right, cfg, interpret=True, x_offset=200, right_context=ctx
    )
    np.testing.assert_array_equal(np.array(got)[:h, :w], want)


def test_pipeline_right_context_matches_wide_halo():
    """compute_disparity on a context patch == the same patch computed with
    a full +D left halo and trimmed (frame-exact cost + identical SGM
    domain start => identical output where the SGM warm-up matches: use
    P1=P2=0 so there is no propagation at all)."""
    import jax.numpy as jnp

    from stereo_tpu.pipeline.pipeline import compute_disparity

    rng = np.random.default_rng(5)
    H, W = 24, 512
    d = 128
    cfg = StereoConfig(
        cost_fn="census", census_window=(5, 5), num_disparities=d,
        num_paths=8, p1=0, p2=0, subpixel=True, lr_check=False,
        median_filter=False, backend="jnp",
    )
    left = jnp.asarray(rng.integers(0, 256, size=(H, W)).astype(np.uint8))
    right = jnp.asarray(rng.integers(0, 256, size=(H, W)).astype(np.uint8))
    x0, x1, halo, r = 256, 448, 8, 2
    g0 = x0 - halo
    ctx = d - 1 + r
    res_ctx = compute_disparity(
        left[:, g0:x1], right[:, g0 - ctx : x1], cfg,
        x_offset=g0, image_width=W, right_context=ctx,
    )
    f0 = x0 - halo - d
    res_wide = compute_disparity(
        left[:, f0:x1], right[:, f0:x1], cfg, x_offset=f0, image_width=W
    )
    a0 = x0 - g0
    b0 = x0 - f0
    np.testing.assert_array_equal(
        np.array(res_ctx.disp[:, a0:]), np.array(res_wide.disp[:, b0:])
    )
    np.testing.assert_array_equal(
        np.array(res_ctx.valid[:, a0:]), np.array(res_wide.valid[:, b0:])
    )


@pytest.mark.parametrize("cost_fn", ["census", "rank"])
def test_cost_kernel_min_disparity_matches_golden(cost_fn):
    """min_disparity composes as a clamped right-shift of the descriptor
    plane + an x_offset - md invalid origin (_md_shift); kernel must stay
    bit-exact vs the golden md volume, incl. offsets and context."""
    from stereo_tpu.ops.cost import rank_cost_volume
    from stereo_tpu.ops.pallas.cost_kernel import rank_cost_volume_pallas

    rng = np.random.default_rng(7)
    h, w = 16, 160
    left = rng.integers(0, 255, (h, w + 128)).astype(np.uint8)
    right = rng.integers(0, 255, (h, w + 128)).astype(np.uint8)
    golden = census_cost_volume if cost_fn == "census" else rank_cost_volume
    kern = (census_cost_volume_pallas if cost_fn == "census"
            else rank_cost_volume_pallas)
    cfg = StereoConfig(cost_fn=cost_fn, census_window=(5, 5),
                       num_disparities=128, min_disparity=5)
    for xo, ctx in [(0, 0), (64, 64), (128, 127)]:
        l2 = left[:, xo:xo + w]
        r2 = right[:, xo - ctx:xo + w]
        g = golden(jnp.asarray(l2), jnp.asarray(r2), cfg, x_offset=xo,
                   right_context=ctx)
        k, kt = kern(jnp.asarray(l2), jnp.asarray(r2), cfg, x_offset=xo,
                     interpret=True, right_context=ctx)
        np.testing.assert_array_equal(np.array(g), np.array(k)[:h, :w])
        if kt is not None:
            np.testing.assert_array_equal(
                np.array(kt)[:w, :h], np.transpose(np.array(g), (1, 0, 2))
            )


def test_sad_kernel_min_disparity_matches_golden():
    rng = np.random.default_rng(8)
    h, w = 16, 96
    left = rng.integers(0, 255, (h, w)).astype(np.uint8)
    right = rng.integers(0, 255, (h, w)).astype(np.uint8)
    cfg = StereoConfig(cost_fn="sad", sad_window=(5, 5), num_disparities=16,
                       min_disparity=3, num_paths=0)
    g = sad_cost_volume(jnp.asarray(left), jnp.asarray(right), cfg,
                        x_offset=32)
    k, _ = sad_cost_volume_pallas(jnp.asarray(left), jnp.asarray(right),
                                  cfg, x_offset=32, interpret=True)
    np.testing.assert_array_equal(np.array(g), np.array(k)[:h, :w])
