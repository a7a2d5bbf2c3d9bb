"""Fused census-Hamming cost-volume construction as a Pallas TPU kernel.

Reference behavior (SURVEY.md C2+C4+C5): per-pixel census descriptors,
then cost(y, x, d) = popcount(census_l(y, x) XOR census_r(y, x - d))
materialized as the H x W x D volume.

TPU-native design:
  * census descriptors are computed by XLA (a handful of fused elementwise
    ops over [H, W] uint32 — not worth a kernel);
  * the d-shift fan-out, the actual bandwidth problem, is ONE strided lane
    roll per row: broadcast the right-descriptor row across D sublanes and
    roll lane u of sublane dd by dd — row dd then holds census_r shifted
    by dd, so the whole [D, XC] tile is one XOR + popcount against the
    broadcast left row. No gathers, no per-d slices.
  * the kernel emits BOTH volume layouts — [H, W, D] for the vertical SGM
    passes and the transposed [W, H, D] for the horizontal passes — for
    one extra sequential write, replacing the XLA transpose that measured
    2.4 ms at KITTI scale.
  * out-of-frame samples (global x - d < 0) get max_unary_cost, matching
    the golden cost_volume exactly.

Oracle: stereo_tpu.ops.cost.census_cost_volume (single-word census; the
multi-word 9x7 window and SAD fall back to the golden path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import StereoConfig
from ..census import census_transform
from .sgm_kernel import plan_dims

_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * (1 << 20))


def _popcount(x: jnp.ndarray) -> jnp.ndarray:
    """SWAR popcount of a uint32 array (Mosaic-safe, no multiply)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    x = x + (x >> 8)
    x = x + (x >> 16)
    return (x & jnp.uint32(0x3F)).astype(jnp.int32)


def _cost_kernel(b_ref, cl_ref, cr_cur_ref, cr_prev_ref, out_ref, out_t_ref,
                 *, xc, d, bh, maxc, interpret, emit_t, words=1):
    """One [W?, BH, XC] descriptor tile -> [BH, XC, D] (+ [XC, BH, D]) cost.

    Descriptor refs carry a leading words axis; multi-word census sums the
    per-word Hamming popcounts. b_ref is the SMEM bounds vector
    (sgm_kernel.N_BOUNDS); b_ref[4] is the block's global x origin, which
    may be a traced tile offset.
    """
    j = pl.program_id(1)
    lane_x = jax.lax.broadcasted_iota(jnp.int32, (d, xc), 1)
    sub_d = jax.lax.broadcasted_iota(jnp.int32, (d, xc), 0)
    # invalid where GLOBAL x - d < 0 (b_ref[4]: the block's global origin)
    invalid = (b_ref[4] + j * xc + lane_x) < sub_d

    # Chunk 0 has no previous chunk (its im_prev aliases itself): samples
    # at LOCAL x - d < 0 must clamp to the block's column-0 descriptor —
    # exactly the golden _shifted_stack's clamp — or the roll wraps in
    # garbage from the block's right. Matters on interior tiles (positive
    # global origin), where local underflow is NOT globally invalid.
    # Patching the prev half keeps every broadcast single-axis (Mosaic
    # cannot broadcast in sublanes and lanes at once). Chunks j > 0 read
    # at most d - 1 <= xc real columns back into their true predecessor.
    is_first = j == 0
    ctxs = []
    for k in range(words):
        prev = cr_prev_ref[k]                                   # [BH, XC]
        cur = cr_cur_ref[k]
        col0 = jnp.broadcast_to(cur[:, :1], prev.shape)
        ctxs.append(
            jnp.concatenate([jnp.where(is_first, col0, prev), cur], axis=1)
        )                                                       # [BH, 2XC]

    rows = []
    rows_t = []
    for r in range(bh):
        pc = jnp.zeros((d, xc), jnp.int32)
        for k in range(words):
            ctx_row = jnp.broadcast_to(ctxs[k][r : r + 1], (d, 2 * xc))
            if interpret:
                u = jax.lax.broadcasted_iota(jnp.int32, (d, 2 * xc), 1)
                dd = jax.lax.broadcasted_iota(jnp.int32, (d, 2 * xc), 0)
                shifted = jnp.take_along_axis(
                    ctx_row, (u - dd) % (2 * xc), axis=1
                )
            else:
                shifted = pltpu.roll(ctx_row, 0, 1, stride=1, stride_axis=0)
            win = shifted[:, xc:]                           # [D, XC]
            clr = jnp.broadcast_to(cl_ref[k][r : r + 1], (d, xc))
            pc = pc + _popcount(jnp.bitwise_xor(clr, win))
        pc = jnp.where(invalid, maxc, pc).astype(out_ref.dtype)
        rows.append(pc.T[None])                             # [1, XC, D]
        if emit_t:
            rows_t.append(pc.T[:, None, :])                 # [XC, 1, D]
    out_ref[:] = jnp.concatenate(rows, axis=0)
    if emit_t:
        out_t_ref[:] = jnp.concatenate(rows_t, axis=1)


def census_cost_volume_pallas(
    left: jnp.ndarray,
    right: jnp.ndarray,
    cfg: StereoConfig,
    interpret: bool = False,
    emit_transposed: bool = True,
    out_dtype=jnp.int16,
    x_offset=0,
):
    """Census-Hamming cost volume on TPU.

    ``x_offset`` is the block's global x origin — column patches of a
    larger frame (parallel/bands.py) pass a static int, shard_map tiles
    (parallel/tiling.py) a traced scalar — so disparity-range invalidation
    matches the whole-frame pipeline.

    Returns (cost [H, W, D], cost_whd [W, H, D] or None), int16, identical
    to the golden census_cost_volume (any census word count).
    """
    if cfg.cost_fn != "census":
        raise NotImplementedError("pallas cost kernel: census only")
    h, w = left.shape
    d = cfg.num_disparities
    maxc = cfg.max_unary_cost
    words = cfg.census_words
    # The transposed emit assembles [XC, BH, D] blocks by middle-dim
    # concatenation, which Mosaic only lowers when D fills the 128-lane
    # register (D=64 fails with "unsupported shape cast"). Smaller D
    # callers transpose in XLA instead (sgm_wta_fused_pallas handles
    # cost_whd=None).
    emit_transposed = emit_transposed and d >= 128

    # [words, H, W] uint32 descriptor planes
    cl = jnp.moveaxis(census_transform(left, cfg.census_window), -1, 0)
    cr = jnp.moveaxis(census_transform(right, cfg.census_window), -1, 0)

    bh = 8
    _, hp, _, wp = plan_dims(h, w, d)
    xc = wp if wp < max(d, 128) else max(d, 128)
    cl = jnp.pad(cl, ((0, 0), (0, hp - h), (0, wp - w)))
    cr = jnp.pad(cr, ((0, 0), (0, hp - h), (0, wp - w)))
    grid = (hp // bh, wp // xc)

    im = lambda i, j: (0, i, j)
    im_prev = lambda i, j: (0, i, jnp.maximum(j - 1, 0))
    out_shapes = [jax.ShapeDtypeStruct((hp, wp, d), out_dtype)]
    out_specs = [
        pl.BlockSpec((bh, xc, d), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM)
    ]
    if emit_transposed:
        out_shapes.append(jax.ShapeDtypeStruct((wp, hp, d), out_dtype))
        out_specs.append(
            pl.BlockSpec((xc, bh, d), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM)
        )

    kernel = functools.partial(
        _cost_kernel, xc=xc, d=d, bh=bh, maxc=maxc, interpret=interpret,
        emit_t=emit_transposed, words=words,
    )
    if not emit_transposed:
        kernel = functools.partial(
            lambda b_r, cl_r, cc_r, cp_r, o_r, **kw: _cost_kernel(
                b_r, cl_r, cc_r, cp_r, o_r, None, **kw
            ),
            xc=xc, d=d, bh=bh, maxc=maxc, interpret=interpret, emit_t=False,
            words=words,
        )

    bounds = jnp.stack(
        [jnp.asarray(v) for v in (0, h, 0, w, x_offset)]
    ).astype(jnp.int32)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((words, bh, xc), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((words, bh, xc), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((words, bh, xc), im_prev, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(bounds, cl, cr, cr)

    cost = outs[0]
    cost_t = outs[1] if emit_transposed else None
    return cost, cost_t  # PADDED [hp, wp, D] / [wp, hp, D] (plan_dims)
