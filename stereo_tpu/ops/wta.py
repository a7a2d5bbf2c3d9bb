"""Winner-take-all disparity selection + subpixel refinement (golden jnp).

Reference behavior (SURVEY.md §2.1 C7-C8): argmin over the summed volume,
then a parabola fit through the winner's neighboring costs:

    d* = d - (C+ - C-) / (2 (C+ - 2 C0 + C-))

TPU-native design: in the fused Pallas path (ops/pallas/sgm_kernel.py) this
runs in the final SGM pass epilogue so the summed volume S is never
materialized (BASELINE.json:5); this jnp version is the standalone oracle and
the golden-path implementation.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..config import StereoConfig


def wta_disparity(
    s: jnp.ndarray, cfg: StereoConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select disparities from the aggregated volume.

    Args:
      s: [H, W, D] int32 aggregated (or raw) cost volume.
      cfg: static config (subpixel, uniqueness_ratio).

    Returns:
      disp: [H, W] float32 disparity (integer-valued if subpixel disabled).
      valid: [H, W] bool (False where the uniqueness test rejects).
    """
    d = s.shape[-1]
    d0 = jnp.argmin(s, axis=-1)                                # [H, W]
    c0 = jnp.take_along_axis(s, d0[..., None], axis=-1)[..., 0]

    valid = jnp.ones(d0.shape, dtype=bool)
    if cfg.uniqueness_ratio > 0:
        # Best cost outside the winner's +-1 neighborhood must exceed
        # c0 * (1 + ratio), else the match is ambiguous.
        ds = jnp.arange(d)
        near = jnp.abs(ds[None, None, :] - d0[..., None]) <= 1
        big = jnp.iinfo(s.dtype).max
        c2 = jnp.min(jnp.where(near, big, s), axis=-1)
        thresh = (
            c0.astype(jnp.float32) * (1.0 + cfg.uniqueness_ratio)
        )
        valid = valid & (c2.astype(jnp.float32) > thresh)

    disp = d0.astype(jnp.float32)
    if cfg.subpixel and d > 1:
        dm = jnp.clip(d0 - 1, 0, d - 1)
        dp = jnp.clip(d0 + 1, 0, d - 1)
        cm = jnp.take_along_axis(s, dm[..., None], axis=-1)[..., 0]
        cp = jnp.take_along_axis(s, dp[..., None], axis=-1)[..., 0]
        cm_f = cm.astype(jnp.float32)
        cp_f = cp.astype(jnp.float32)
        c0_f = c0.astype(jnp.float32)
        denom = cp_f + cm_f - 2.0 * c0_f
        # Guard the zero-curvature denominator (SURVEY.md §5 race/sanitizer
        # note) and only refine interior winners.
        offset = jnp.where(
            denom > 0, (cm_f - cp_f) / (2.0 * jnp.maximum(denom, 1.0)), 0.0
        )
        offset = jnp.clip(offset, -0.5, 0.5)
        interior = (d0 > 0) & (d0 < d - 1)
        disp = disp + jnp.where(interior, offset, 0.0)

    disp = disp + jnp.float32(cfg.min_disparity)
    return disp, valid
