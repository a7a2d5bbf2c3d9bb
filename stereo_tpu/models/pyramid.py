"""Coarse-to-fine pyramid SGM (new capability beyond the reference).

Motivation: SGM cost scales with H*W*D. A half-resolution pass costs 1/8th
of the full volume and already localizes disparity to a few pixels; the
full-resolution pass then only searches a small residual window around the
upsampled coarse estimate — total work ~(1/8 + R/D) of the classic
pipeline for a residual range R << D (hierarchical MGM/SGM literature,
PAPERS.md pattern).

TPU mapping:
  * coarse pass: the ordinary pipeline on 2x2-mean-pooled images with D/2
    disparities (Pallas fast path applies);
  * residual pass: census descriptors of BOTH images are computed in
    their own frames (no window distortion), then the right descriptors
    are gathered at x - base(x) - o for offsets o in [-R/2, R/2) — R
    cheap [H, W] gathers instead of a volume gather; the residual volume
    is aggregated by the same SGM ops with min_disparity = -R/2 and the
    final disparity is base + residual.

Accuracy: exact where the true disparity lies within R/2 of the coarse
estimate. Two known artifact sources (quantified in eval/benchmarks, a
few percent extra bad-3.0 on discontinuity-heavy scenes): coarse-pass
errors larger than R/2, and SGM smoothing acting in RESIDUAL space, where
continuity across base discontinuities differs from disparity space.
This is the documented speed/quality trade of the fast model family; the
classic model is the reference-parity path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import KITTI_SGM8_128, StereoConfig
from ..ops import census_transform, hamming_distance, median_3x3, sgm_aggregate
from ..ops.wta import wta_with_aux
from ..pipeline.pipeline import StereoResult, compute_disparity
from .base import StereoModel


def _pool2(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 mean pooling (pads odd extents by edge replication)."""
    h, w = img.shape
    hp, wp = h + (h % 2), w + (w % 2)
    p = jnp.pad(img.astype(jnp.float32), ((0, hp - h), (0, wp - w)), mode="edge")
    pooled = p.reshape(hp // 2, 2, wp // 2, 2).mean(axis=(1, 3))
    return pooled.astype(jnp.uint8)


def _upsample2(base: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample of a coarse disparity, scaled by 2."""
    up = jnp.repeat(jnp.repeat(base, 2, axis=0), 2, axis=1)
    return up[:h, :w] * 2.0


def _local_minmax_center(base: jnp.ndarray, k: int = 5) -> jnp.ndarray:
    """Center of the local disparity spread: (minpool_k + maxpool_k) / 2.

    At discontinuities the upsampled coarse estimate can be off by more
    than the residual half-window; centering the search on the midpoint of
    the local min/max lets a window of R cover a local spread of up to R
    (standard hierarchical-stereo trick).
    """
    r = k // 2
    p = jnp.pad(base, ((r, r), (r, r)), mode="edge")
    h, w = base.shape
    mn = base
    mx = base
    for dy in range(k):
        for dx in range(k):
            win = p[dy : dy + h, dx : dx + w]
            mn = jnp.minimum(mn, win)
            mx = jnp.maximum(mx, win)
    return jnp.round((mn + mx) * 0.5)


class PyramidSGM(StereoModel):
    name = "pyramid"

    def __init__(
        self,
        cfg: StereoConfig = KITTI_SGM8_128,
        residual_range: int = 16,
    ):
        super().__init__(cfg)
        if residual_range % 2:
            raise ValueError("residual_range must be even")
        self.residual_range = residual_range

    def _forward(self, left, right):
        cfg = self.cfg
        r = self.residual_range
        h, w = left.shape

        # --- coarse pass at half resolution, D/2 ---
        coarse_cfg = cfg.replace(
            num_disparities=max(8, cfg.num_disparities // 2),
            lr_check=False,
            median_filter=True,
            subpixel=False,
        )
        res_c = compute_disparity(_pool2(left), _pool2(right), coarse_cfg)
        base = _upsample2(res_c.disp, h, w)
        base = _local_minmax_center(base)

        # --- residual pass at full resolution over [-r/2, r/2) ---
        cl = census_transform(left, cfg.census_window)
        cr = census_transform(right, cfg.census_window)

        half = r // 2
        base_i = jnp.round(base).astype(jnp.int32)
        xs2 = jnp.arange(w)[None, :]

        def plane(o):
            # sample right-frame descriptors at x - base - (o - half)
            src = jnp.clip(xs2 - base_i - (o - half), 0, w - 1)
            cr_s = jnp.take_along_axis(
                cr, src[:, :, None], axis=1
            )
            return hamming_distance(cl, cr_s)

        vol = jax.vmap(plane, out_axes=2)(jnp.arange(r))       # [H, W, R]
        # invalid where the total disparity leaves the image or the search
        # range of the classic model
        total = base[:, :, None] + (
            jnp.arange(r)[None, None, :] - half
        )
        xs = jnp.arange(w)[None, :, None]
        invalid = (
            (xs - total < 0)
            | (total < 0)
            | (total > cfg.num_disparities - 1)
        )
        maxc = jnp.int32(cfg.max_unary_cost)
        vol = jnp.where(invalid, maxc, vol)

        res_cfg = cfg.replace(
            num_disparities=r, min_disparity=-half, lr_check=False
        )
        # Residual aggregation is plain SGM over an [H, W, R] volume — the
        # Pallas blocked-pass kernel applies directly (bit-exact vs the
        # golden scan; no disparity framing is involved at this stage).
        from ..pipeline.pipeline import _pallas_mode

        mode = _pallas_mode(res_cfg, None, None)
        if mode is not None:
            from ..ops.pallas.sgm_kernel import sgm_aggregate_pallas

            s = sgm_aggregate_pallas(
                vol.astype(jnp.int16), res_cfg, interpret=mode
            ).astype(jnp.float32)
        else:
            s = sgm_aggregate(vol, res_cfg, image=left)
        disp_r, ok, _ = wta_with_aux(s, res_cfg)
        disp = base + disp_r
        ok = ok & (disp >= 0) & (disp <= cfg.num_disparities - 1)
        if cfg.median_filter:
            disp = median_3x3(disp)
        return StereoResult(disp=disp, valid=ok)

    def build(self):
        return jax.jit(self._forward)
