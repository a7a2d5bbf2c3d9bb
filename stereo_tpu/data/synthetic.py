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
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np


class StereoPair(NamedTuple):
    left: np.ndarray        # [H, W] uint8
    right: np.ndarray       # [H, W] uint8
    gt_disp: np.ndarray     # [H, W] float32 left-view disparity
    gt_valid: np.ndarray    # [H, W] bool (GT defined and non-occluded)
    name: str = "synthetic"


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


def make_pair(
    shape: Tuple[int, int] = (128, 256),
    max_disp: int = 15,
    kind: str = "shapes",
    texture: str = "noise",
    noise_std: float = 0.0,
    seed: int = 0,
    subpixel: bool = False,
) -> StereoPair:
    """Generate a synthetic rectified stereo pair.

    Args:
      shape: (H, W).
      max_disp: maximum ground-truth disparity (keep < config D).
      kind: disparity-field family:
        "constant"  — whole image at max_disp // 2 (exact-recovery tests);
        "slant"     — linear left-to-right ramp 0..max_disp;
        "shapes"    — background plane + 3 fronto-parallel fore objects;
        "steps"     — horizontal bands at increasing depth.
      texture: "noise" (random-dot) or "cloud" (band-limited smooth texture
        with added dots, closer to natural images).
      noise_std: stddev of iid sensor noise added to both views.
      subpixel: allow fractional ground-truth disparities.

    Returns: StereoPair with exact left-view GT and occlusion-aware validity.
    """
    h, w = shape
    rng = np.random.default_rng(seed)

    # --- ground-truth disparity field ---
    if kind == "constant":
        disp = np.full((h, w), max_disp // 2, dtype=np.float32)
    elif kind == "slant":
        ramp = np.linspace(0, max_disp, w, dtype=np.float32)
        disp = np.broadcast_to(ramp[None, :], (h, w)).copy()
    elif kind == "steps":
        disp = np.zeros((h, w), dtype=np.float32)
        bands = 4
        for i in range(bands):
            disp[i * h // bands : (i + 1) * h // bands, :] = (
                max_disp * (i + 1) / bands
            )
    elif kind == "shapes":
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
    else:
        raise ValueError(f"unknown kind {kind}")

    if not subpixel:
        disp = np.round(disp)
    disp = np.clip(disp, 0, max_disp).astype(np.float32)

    # --- right-view texture ---
    if texture == "noise":
        right = rng.integers(0, 256, size=(h, w)).astype(np.float32)
    elif texture == "cloud":
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
        right = 0.65 * (up * 255.0) + 0.35 * dots
    else:
        raise ValueError(f"unknown texture {texture}")

    left = _sample_right(right, disp)
    if noise_std > 0:
        left = left + rng.normal(0, noise_std, size=left.shape)
        right = right + rng.normal(0, noise_std, size=right.shape)

    occluded = _occlusion_mask(disp)
    in_frame = (np.arange(w)[None, :] - disp) >= 0
    gt_valid = (~occluded) & in_frame

    return StereoPair(
        left=np.clip(left, 0, 255).astype(np.uint8),
        right=np.clip(right, 0, 255).astype(np.uint8),
        gt_disp=disp,
        gt_valid=gt_valid,
        name=f"synthetic-{kind}-{texture}-{h}x{w}-d{max_disp}-s{seed}",
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
