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


#: Cap on the materialized one-hot select operand of the MXU residual
#: gather (per lax.map band). 512 MB keeps KITTI-width frames in ~3 bands
#: and Middlebury full-res bounded (vs ~23 GB unbanded — ADVICE r1).
_ONEHOT_BUDGET_BYTES = 512 * (1 << 20)


def _residual_cost_volume(
    cl: jnp.ndarray,
    cr: jnp.ndarray,
    base_i: jnp.ndarray,
    half: int,
    r: int,
    use_mxu: bool,
) -> jnp.ndarray:
    """vol[y, x, o] = hamming(cl[y, x], cr[y, clip(x - base - (o - half))]).

    Two equivalent constructions (bit-exact, tests/models):

    * gather: r take_along_axis gathers — fine on CPU, catastrophic on TPU
      (per-pixel dynamic indices serialize onto the scalar core; measured
      ~100 ms of the pyramid model's 120 ms frame at KITTI scale).
    * mxu: express the gather as a one-hot bf16 matmul per row. The right
      descriptors are split into 8-bit chunks (exact in bf16; a one-hot
      operand means each output is a single product, never a sum) and all
      r offsets share one index array: M[y, j, (o, chunk)] holds STATIC
      shifts of the chunked descriptors, so one batched
      [W, Wp] @ [Wp, r*chunks] matmul per row gathers every offset — the
      MXU does in ~2 ms what the scalar core did in ~100 ms.

    Clip semantics match the gather formulation everywhere the entry is
    not masked afterwards: indices that clip at either frame edge imply a
    total disparity outside [0, D) or x - d < 0, which the caller
    overwrites with max_unary_cost (see PyramidSGM._forward).

    Requires base_i >= 0 (guaranteed by the caller's clamp): the one-hot
    index pad covers x - base + half only up to w - 1 + half.
    """
    h, w = base_i.shape
    words = cl.shape[2]
    xs = jnp.arange(w)[None, :]

    if not use_mxu:
        def plane(o):
            src = jnp.clip(xs - base_i - (o - half), 0, w - 1)
            cr_s = jnp.take_along_axis(cr, src[:, :, None], axis=1)
            return hamming_distance(cl, cr_s)

        return jax.vmap(plane, out_axes=2)(jnp.arange(r))      # [H, W, R]

    nch = 4 * words                                   # 8-bit chunks
    wp = w + half                                     # j = x - base + half
    wpp = -(-wp // 128) * 128                         # MXU lane padding
    # M[y, j, o, word, chunk] = chunk(cr[y, clip(j - o, 0, w - 1)]) via
    # static shifts of an edge-padded copy (left pad r-1 covers j - o < 0).
    cr_pad = jnp.pad(cr, ((0, 0), (r - 1, half), (0, 0)), mode="edge")
    m = jnp.stack(
        [cr_pad[:, r - 1 - o : r - 1 - o + wp] for o in range(r)], axis=2
    )                                                 # [H, Wp, R, words]
    shifts = (8 * jnp.arange(4, dtype=jnp.uint32))[None, None, None, None]
    m_c = (m[..., None] >> shifts) & jnp.uint32(0xFF)
    m_f = (
        m_c.astype(jnp.bfloat16)
        .reshape(h, wp, r * nch)
    )
    m_f = jnp.pad(m_f, ((0, 0), (0, wpp - wp), (0, 0)))
    j = jnp.clip(xs - base_i + half, 0, wp - 1)       # [H, W]

    # The one-hot operand is [bh, W, Wpp] bf16 — ~2*W^2 bytes per row, so a
    # whole-frame build is ~1.2 GB at KITTI width but ~23 GB at Middlebury
    # full-res (ADVICE r1). Band the rows with lax.map so the operand stays
    # under a fixed budget; MXU work is identical, only the fan-out of the
    # materialized select matrix is bounded.
    bh = max(1, min(h, _ONEHOT_BUDGET_BYTES // (w * wpp * 2)))
    nb = -(-h // bh)
    hb = nb * bh
    j_b = jnp.pad(j, ((0, hb - h), (0, 0))).reshape(nb, bh, w)
    m_b = jnp.pad(m_f, ((0, hb - h), (0, 0), (0, 0))).reshape(
        nb, bh, wpp, r * nch
    )

    def _band(args):
        j_i, m_i = args
        onehot = (
            j_i[:, :, None] == jnp.arange(wpp)[None, None, :]
        ).astype(jnp.bfloat16)
        return jnp.einsum(
            "hxj,hjc->hxc", onehot, m_i,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)                           # exact: one-hot select

    g = jax.lax.map(_band, (j_b, m_b)).reshape(hb, w, r * nch)[:h]
    g = g.reshape(h, w, r, words, 4)
    cl_c = (
        cl[:, :, None, :, None] >> (8 * jnp.arange(4, dtype=jnp.uint32))
    ) & jnp.uint32(0xFF)                              # [H, W, 1, words, 4]
    ham = jax.lax.population_count(
        jnp.bitwise_xor(g.astype(jnp.uint32), cl_c)
    ).astype(jnp.int32)
    return ham.sum(axis=(3, 4))                       # [H, W, R]


class PyramidSGM(StereoModel):
    name = "pyramid"

    def __init__(
        self,
        cfg: StereoConfig = KITTI_SGM8_128,
        residual_range: int = 16,
        census_window=None,
    ):
        """``census_window``: None (default) inherits ``cfg``'s window —
        an explicitly passed config is never silently overridden
        (ADVICE r4). Speed-trade callers opt into the 1-word ``(5, 5)``
        descriptor explicitly (bench.py's pyramid row does): the tuned
        presets' 2-word 9x7 census roughly doubles both the coarse cost
        pass and the residual MXU gather (nch chunks scale with words),
        while the pyramid's quality is dominated by its own
        approximation artifacts, not descriptor bits."""
        super().__init__(cfg)
        if residual_range % 2:
            raise ValueError("residual_range must be even")
        self.residual_range = residual_range
        if census_window is not None:
            self.cfg = self.cfg.replace(census_window=census_window)

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
        # Coarse disparities are >= 0 by construction; the clamp also pins
        # any future negative-min_disparity coarse config to the precondition
        # of _residual_cost_volume.
        base = jnp.clip(base, 0, cfg.num_disparities - 1)
        base_i = jnp.round(base).astype(jnp.int32)
        use_mxu = cfg.backend != "jnp" and jax.default_backend() == "tpu"
        vol = _residual_cost_volume(cl, cr, base_i, half, r, use_mxu)
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
                vol.astype(jnp.int16), res_cfg, interpret=mode, image=left
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
