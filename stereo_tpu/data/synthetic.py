"""Procedural stereo pairs with exact ground truth.

The reference is evaluated on Middlebury/KITTI image pairs (BASELINE.json:
7-11); those datasets cannot be fetched in this environment, so the test and
bench harnesses run on procedurally generated pairs with *exact* known
disparity (SURVEY.md §4.2: random-dot stereograms with planar shifts give
exactly recoverable disparity). Loaders for the real datasets live in
data/middlebury.py and data/kitti.py and activate when files are present.

Construction: the right image is a random (or textured) scene; the left
image samples it at ``left(y, x) = right(y, x - d(y, x))`` where ``d`` is
the left-view ground-truth disparity — by construction pixel (y, x) in the
left image corresponds to (y, x - d) in the right image. Occluded pixels
(where the mapping is not injective) are flagged in the occlusion mask.

Besides the clean scenes, this module generates ADVERSARIAL conditions
(VERDICT r2 #1: easy warped pairs near-trivially favor census matching and
cannot support the ≤4% bad-3.0 claim). The hard knobs model the failure
modes real rigs hit:

  * per-view radiometric distortion (``gain``/``bias``/``gamma`` applied to
    the LEFT view only, after geometric construction) — exposure/vignetting
    mismatch between cameras; census is invariant to monotone intensity
    maps, SAD is not (census's raison d'être, SURVEY.md C2);
  * independent sensor noise per view (``noise_std``);
  * occlusion-heavy layered scenes (``kind="layers"``) — wide disocclusion
    bands from large disparity jumps;
  * textureless regions (``flat_frac``) — matching is locally ambiguous,
    exercising SGM's smoothness propagation and the LR/uniqueness gates;
  * slanted surfaces (``kind="wedges"``, fractional GT) and thin structures
    (``kind="bars"``) — subpixel fits and fine-structure preservation;
  * rectification jitter (``y_jitter``) — vertical misalignment breaking
    the epipolar assumption by a fraction of a pixel.

The curated scenario list lives in :mod:`stereo_tpu.eval.hard_suite`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import numpy as np


class StereoPair(NamedTuple):
    left: np.ndarray        # [H, W] uint8
    right: np.ndarray       # [H, W] uint8
    gt_disp: np.ndarray     # [H, W] float32 left-view disparity
    gt_valid: np.ndarray    # [H, W] bool (GT defined and non-occluded)
    name: str = "synthetic"
    # GT defined INCLUDING occluded pixels (the geometric left-view field is
    # known everywhere in-frame) — the KITTI disp_occ analog, used to score
    # occlusion fill. None for real datasets whose loaders predate it.
    gt_valid_all: Optional[np.ndarray] = None


def _sample_right(right: np.ndarray, disp: np.ndarray) -> np.ndarray:
    """left(y, x) = right(y, x - d) with linear interp for fractional d."""
    h, w = right.shape
    xs = np.arange(w)[None, :].astype(np.float32) - disp
    x0 = np.floor(xs).astype(np.int64)
    frac = xs - x0
    x0c = np.clip(x0, 0, w - 1)
    x1c = np.clip(x0 + 1, 0, w - 1)
    rows = np.arange(h)[:, None]
    val = (1.0 - frac) * right[rows, x0c] + frac * right[rows, x1c]
    return val


def _occlusion_mask(disp: np.ndarray) -> np.ndarray:
    """Left-view pixels whose right-image match is hidden by a nearer pixel.

    Pixel x maps to x_r = x - d(x). x is occluded if some x' > x maps to the
    same (or a crossing) x_r — i.e. the warp is non-monotonic. A pixel is
    visible iff its x_r is strictly greater than every x_r to its left
    after accounting for ordering; equivalently occluded where
    x_r(x) <= running_max(x_r(0..x-1)).
    """
    h, w = disp.shape
    xr = np.arange(w)[None, :] - disp
    occluded = np.zeros((h, w), dtype=bool)
    run = np.full((h,), -np.inf, dtype=np.float64)
    for x in range(w):
        col = xr[:, x]
        occluded[:, x] = col <= run
        run = np.maximum(run, col)
    return occluded


def _disparity_field(kind, h, w, max_disp, rng):
    """Ground-truth left-view disparity for each scene family."""
    if kind == "constant":
        return np.full((h, w), max_disp // 2, dtype=np.float32)
    if kind == "slant":
        ramp = np.linspace(0, max_disp, w, dtype=np.float32)
        return np.broadcast_to(ramp[None, :], (h, w)).copy()
    if kind == "steps":
        disp = np.zeros((h, w), dtype=np.float32)
        bands = 4
        for i in range(bands):
            disp[i * h // bands : (i + 1) * h // bands, :] = (
                max_disp * (i + 1) / bands
            )
        return disp
    if kind == "shapes":
        disp = np.full((h, w), max(1.0, 0.15 * max_disp), dtype=np.float32)
        for _ in range(3):
            cy, cx = rng.integers(h // 6, 5 * h // 6), rng.integers(
                w // 6, 5 * w // 6
            )
            ry, rx = rng.integers(h // 10, h // 4), rng.integers(
                w // 10, w // 4
            )
            level = rng.uniform(0.4 * max_disp, max_disp)
            ys, xs = np.ogrid[:h, :w]
            if rng.random() < 0.5:
                mask = (np.abs(ys - cy) < ry) & (np.abs(xs - cx) < rx)
            else:
                mask = ((ys - cy) / ry) ** 2 + ((xs - cx) / rx) ** 2 < 1.0
            disp = np.where(mask & (level > disp), level, disp)
        return disp
    if kind == "layers":
        # Occlusion-heavy: many overlapping foreground objects with LARGE
        # depth jumps over a far background — each jump of Δd pixels opens
        # a Δd-wide disocclusion band to the object's left.
        disp = np.full((h, w), 1.0, dtype=np.float32)
        ys, xs = np.ogrid[:h, :w]
        for _ in range(8):
            cy, cx = rng.integers(0, h), rng.integers(0, w)
            ry = rng.integers(max(2, h // 12), max(3, h // 4))
            rx = rng.integers(max(2, w // 14), max(3, w // 5))
            level = rng.uniform(0.55 * max_disp, max_disp)
            if rng.random() < 0.5:
                mask = (np.abs(ys - cy) < ry) & (np.abs(xs - cx) < rx)
            else:
                mask = ((ys - cy) / ry) ** 2 + ((xs - cx) / rx) ** 2 < 1.0
            disp = np.where(mask & (level > disp), level, disp)
        return disp
    if kind == "wedges":
        # Piecewise slanted planes: vertical strips, each a plane with a
        # different x-slope and base — fractional disparities everywhere
        # (exercises subpixel fits; integer WTA floors at bad-0.5).
        disp = np.zeros((h, w), dtype=np.float32)
        n_str = 4
        edges = np.linspace(0, w, n_str + 1).astype(int)
        for i in range(n_str):
            x0, x1 = edges[i], edges[i + 1]
            base = rng.uniform(0.1 * max_disp, 0.7 * max_disp)
            slope = rng.uniform(-1.0, 1.0) * 0.3 * max_disp / max(1, x1 - x0)
            yslope = rng.uniform(-0.5, 0.5) * 0.2 * max_disp / h
            xs_l = np.arange(x1 - x0, dtype=np.float32)[None, :]
            ys_l = np.arange(h, dtype=np.float32)[:, None]
            disp[:, x0:x1] = base + slope * xs_l + yslope * ys_l
        return np.clip(disp, 0.0, max_disp).astype(np.float32)
    if kind == "bars":
        # Thin foreground structures (2-4 px) over a far background: SGM's
        # smoothness prior wants to erase them; measures fine-structure
        # preservation (SURVEY.md §6 literature anchors).
        disp = np.full((h, w), max(1.0, 0.1 * max_disp), dtype=np.float32)
        level = 0.85 * max_disp
        for _ in range(6):
            if rng.random() < 0.5:
                x = rng.integers(4, max(5, w - 4))
                t = int(rng.integers(2, 5))
                disp[:, x : x + t] = level
            else:
                y = rng.integers(4, max(5, h - 4))
                t = int(rng.integers(2, 5))
                disp[y : y + t, :] = level
        return disp
    raise ValueError(f"unknown kind {kind}")


def _texture(texture, h, w, rng, period=None):
    if texture == "noise":
        return rng.integers(0, 256, size=(h, w)).astype(np.float32)
    if texture == "cloud":
        base = rng.normal(size=(h // 8 + 2, w // 8 + 2))
        ys = np.linspace(0, base.shape[0] - 1.001, h)
        xs = np.linspace(0, base.shape[1] - 1.001, w)
        y0, x0 = np.floor(ys).astype(int), np.floor(xs).astype(int)
        fy, fx = (ys - y0)[:, None], (xs - x0)[None, :]
        up = (
            base[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
            + base[np.ix_(y0 + 1, x0)] * fy * (1 - fx)
            + base[np.ix_(y0, x0 + 1)] * (1 - fy) * fx
            + base[np.ix_(y0 + 1, x0 + 1)] * fy * fx
        )
        up = (up - up.min()) / (np.ptp(up) + 1e-9)
        dots = rng.integers(0, 256, size=(h, w)).astype(np.float32)
        return 0.65 * (up * 255.0) + 0.35 * dots
    if texture == "picket":
        # Repetitive texture — the canonical stereo ambiguity (picket
        # fence / aliasing): vertical stripes of period ``p`` make the
        # matching cost near-minimal at every lattice offset d ± k*p, so
        # WTA locks onto the wrong alias and only the uniqueness /
        # smoothness gates can catch it. A weak dot layer (5%) keeps a
        # faint true signal, as real fences/railings do — with the hard
        # suite's noise_std=6 the true-match advantage sits near the
        # noise floor (measured: ~12% bad3 untuned at CI scale).
        # ``period`` must stay below the disparity search range for
        # in-range aliases to exist (the scenario passes period 8,
        # ambiguous from the D=16 CI scale up).
        p = int(period) if period else int(rng.integers(10, 15))
        phase = rng.uniform(0, p)
        xs = np.arange(w, dtype=np.float32)[None, :]
        stripes = ((xs + phase) % p) < (p / 2)
        base = np.where(stripes, 210.0, 45.0)
        base = np.broadcast_to(base, (h, w)).astype(np.float32)
        dots = rng.integers(0, 256, size=(h, w)).astype(np.float32)
        return 0.95 * base + 0.05 * dots
    raise ValueError(f"unknown texture {texture}")


def make_pair(
    shape: Tuple[int, int] = (128, 256),
    max_disp: int = 15,
    kind: str = "shapes",
    texture: str = "noise",
    noise_std: float = 0.0,
    seed: int = 0,
    subpixel: bool = False,
    gain: float = 1.0,
    bias: float = 0.0,
    gamma: float = 1.0,
    flat_frac: float = 0.0,
    y_jitter: float = 0.0,
    period: Optional[int] = None,
) -> StereoPair:
    """Generate a synthetic rectified stereo pair.

    Args:
      shape: (H, W).
      max_disp: maximum ground-truth disparity (keep < config D).
      kind: disparity-field family:
        "constant"  — whole image at max_disp // 2 (exact-recovery tests);
        "slant"     — linear left-to-right ramp 0..max_disp;
        "shapes"    — background plane + 3 fronto-parallel fore objects;
        "steps"     — horizontal bands at increasing depth;
        "layers"    — 8 overlapping objects, wide disocclusions (HARD);
        "wedges"    — piecewise slanted planes, fractional GT (HARD);
        "bars"      — 2-4 px thin structures over far background (HARD).
      texture: "noise" (random-dot), "cloud" (band-limited smooth texture
        with added dots, closer to natural images), or "picket" (periodic
        vertical stripes — the classic repetitive-texture ambiguity, HARD).
      noise_std: stddev of INDEPENDENT iid sensor noise added per view.
      subpixel: allow fractional ground-truth disparities.
      gain/bias/gamma: radiometric distortion of the LEFT view only,
        applied after geometric construction:
        ``left' = gain * 255 * (left/255)^gamma + bias`` — a monotone
        map modeling exposure/response mismatch between the two cameras.
      flat_frac: approximate fraction of the image covered by textureless
        (constant-intensity) patches painted into BOTH views consistently.
      y_jitter: vertical rectification error in pixels — the right view is
        resampled shifted by this amount, so true correspondences no longer
        lie on the same row.

    Returns: StereoPair with exact left-view GT, occlusion-aware validity,
    and ``gt_valid_all`` (GT defined including occlusions, for scoring
    occlusion fill).
    """
    h, w = shape
    rng = np.random.default_rng(seed)

    disp = _disparity_field(kind, h, w, max_disp, rng)
    if kind == "wedges" or subpixel:
        pass  # keep fractional GT
    else:
        disp = np.round(disp)
    disp = np.clip(disp, 0, max_disp).astype(np.float32)

    right = _texture(texture, h, w, rng, period=period)

    if flat_frac > 0.0:
        # Paint constant-intensity patches into the RIGHT view before
        # warping: both views see the same flat region, geometrically
        # consistent but locally unmatchable.
        target = flat_frac * h * w
        covered = 0.0
        ys, xs = np.ogrid[:h, :w]
        while covered < target:
            cy, cx = rng.integers(0, h), rng.integers(0, w)
            ry = rng.integers(max(2, h // 10), max(3, h // 3))
            rx = rng.integers(max(2, w // 10), max(3, w // 3))
            mask = (np.abs(ys - cy) < ry) & (np.abs(xs - cx) < rx)
            right[mask] = float(rng.integers(60, 200))
            covered += mask.sum()

    left = _sample_right(right, disp)

    if y_jitter != 0.0:
        # Shift the right view vertically by a (fractional) jitter: the
        # epipolar assumption now holds only to ~y_jitter pixels.
        y0 = int(np.floor(y_jitter))
        frac = y_jitter - y0
        idx0 = np.clip(np.arange(h) + y0, 0, h - 1)
        idx1 = np.clip(np.arange(h) + y0 + 1, 0, h - 1)
        right = (1.0 - frac) * right[idx0] + frac * right[idx1]

    if gamma != 1.0:
        left = 255.0 * np.power(np.clip(left, 0, 255) / 255.0, gamma)
    if gain != 1.0 or bias != 0.0:
        left = gain * left + bias

    if noise_std > 0:
        left = left + rng.normal(0, noise_std, size=left.shape)
        right = right + rng.normal(0, noise_std, size=right.shape)

    occluded = _occlusion_mask(disp)
    in_frame = (np.arange(w)[None, :] - disp) >= 0
    gt_valid = (~occluded) & in_frame

    tag = ""
    if gain != 1.0 or bias != 0.0 or gamma != 1.0:
        tag += f"-rad{gain:g}_{bias:g}_{gamma:g}"
    if noise_std:
        tag += f"-n{noise_std:g}"
    if flat_frac:
        tag += f"-flat{flat_frac:g}"
    if y_jitter:
        tag += f"-jit{y_jitter:g}"
    return StereoPair(
        left=np.clip(left, 0, 255).astype(np.uint8),
        right=np.clip(right, 0, 255).astype(np.uint8),
        gt_disp=disp,
        gt_valid=gt_valid,
        name=f"synthetic-{kind}-{texture}-{h}x{w}-d{max_disp}-s{seed}{tag}",
        gt_valid_all=in_frame,
    )


def kitti_like_pair(seed: int = 0, max_disp: int = 96) -> StereoPair:
    """KITTI-resolution (375 x 1242) synthetic pair for benchmarking."""
    return make_pair(
        shape=(375, 1242),
        max_disp=max_disp,
        kind="shapes",
        texture="cloud",
        seed=seed,
    )
