"""Single-device row-band processing for frames too large to fit whole.

Config 4 (BASELINE.json:10, 2880x1988 at 256 disparities) has a ~1.5G-cell
cost volume; multi-chip runs tile it with halo exchange (tiling.py), but a
SINGLE chip must bound its working set instead. This runner splits the
frame into horizontal bands processed sequentially (a static Python loop
under one jit), each extended by a warm-up halo of rows:

  * horizontal SGM paths are EXACT (bands span the full width, and the
    disparity search needs no vertical support);
  * vertical/diagonal paths start fresh at the extended band edge, the
    same bounded-error trade as the distributed halo mode — measured, not
    assumed (tests compare against the whole-frame pipeline);
  * memory scales with band_rows x W x D instead of H x W x D.

The reference has no counterpart: it assumes the whole volume fits the
GPU (SURVEY.md §5 long-context note — this is the blockwise-processing
analog along the row axis).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import StereoConfig, TileConfig
from ..pipeline.pipeline import StereoResult, compute_disparity


def build_banded_pipeline(
    cfg: StereoConfig,
    image_shape,
    n_bands: int,
    n_cols: int = 1,
    halo: Optional[int] = None,
    donate: bool = False,
):
    """Jitted ``(left, right) -> StereoResult`` processing row bands (and
    optionally column patches).

    Args:
      image_shape: (H, W) static frame extent.
      n_bands: horizontal bands (peak memory ~ 1/n_bands).
      n_cols: optional vertical splits. Column patches carry a wider x halo
        (warm-up + D on the left for the disparity search, + D on the right
        when the cheap LR re-index is active) and a STATIC global x offset,
        so the Pallas fast path's disparity-range masking and LR framing
        stay frame-exact; only SGM warm-up at patch edges is approximate.
      halo: warm-up rows/cols; default derives from the config like the
        distributed tiling does.
    """
    h, w = image_shape
    if halo is None:
        halo = TileConfig().resolved_halo(cfg)
    bh = -(-h // n_bands)
    bw = -(-w // n_cols)
    d = cfg.num_disparities
    hx_lo = halo + d
    hx_hi = halo + (d if (cfg.lr_check and not cfg.lr_exact) else 0)

    def banded(left, right):
        if left.shape != (h, w):
            raise ValueError(f"banded pipeline built for {(h, w)}, got {left.shape}")
        row_parts = []
        for b in range(n_bands):
            y0 = b * bh
            y1 = min(h, y0 + bh)
            e0 = max(0, y0 - halo)
            e1 = min(h, y1 + halo)
            col_d = []
            col_v = []
            for c in range(n_cols):
                x0 = c * bw
                x1 = min(w, x0 + bw)
                f0 = max(0, x0 - hx_lo)
                f1 = min(w, x1 + hx_hi)
                res = compute_disparity(
                    left[e0:e1, f0:f1], right[e0:e1, f0:f1], cfg,
                    x_offset=f0, image_width=w,
                )
                col_d.append(res.disp[y0 - e0 : y1 - e0, x0 - f0 : x1 - f0])
                col_v.append(res.valid[y0 - e0 : y1 - e0, x0 - f0 : x1 - f0])
            row_parts.append(
                (jnp.concatenate(col_d, axis=1), jnp.concatenate(col_v, axis=1))
                if n_cols > 1
                else (col_d[0], col_v[0])
            )
        return StereoResult(
            disp=jnp.concatenate([r[0] for r in row_parts], axis=0),
            valid=jnp.concatenate([r[1] for r in row_parts], axis=0),
        )

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(banded, donate_argnums=donate_argnums)
