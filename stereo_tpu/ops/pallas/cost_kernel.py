"""Cost-volume construction as Pallas TPU kernels (census, rank, SAD).

Reference behavior (SURVEY.md C2+C4+C5): per-pixel descriptors (census
bitstrings / rank counts) or raw intensities, then
cost(y, x, d) = combine(left(y, x), right(y, x - d)) materialized as the
H x W x D volume — optionally box-summed over the SAD window.

TPU-native design:
  * census/rank descriptors are computed by XLA (a handful of fused
    elementwise ops over [H, W] — not worth a kernel);
  * the d-shift fan-out, the actual bandwidth problem, is ONE strided lane
    roll per row: broadcast the right-descriptor row across D sublanes and
    roll lane u of sublane dd by dd — row dd then holds the right row
    shifted by dd, so the whole [D, XC] tile is one combine (XOR+popcount
    for census, |a-b| for rank/SAD) against the broadcast left row. No
    gathers, no per-d slices.
  * the census/rank kernel emits BOTH volume layouts — [H, W, D] for the
    vertical SGM passes and the transposed [W, H, D] for the horizontal
    passes — for one extra sequential write, replacing the XLA transpose
    that measured 2.4 ms at KITTI scale.
  * the SAD kernel fuses the d-fanout with the box filter: absolute
    differences for a row band (+ window halos) live in VMEM once and the
    window sum is a sliding vertical accumulator + static lane-shifted
    adds — the [H, W, D] AD tensor is never materialized in HBM.
  * out-of-frame samples (global x - d < 0) get max_unary_cost, matching
    the golden cost_volume exactly.

Oracles: stereo_tpu.ops.cost.{census,rank,sad}_cost_volume — every kernel
is bit-exact against its golden twin (tests/ops/test_pallas_cost.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import StereoConfig
from ..census import census_transform, rank_transform
from .sgm_kernel import plan_dims

_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * (1 << 20))


def _popcount_bytes(x: jnp.ndarray) -> jnp.ndarray:
    """SWAR stages 1-3: per-byte bit counts (each byte <= 8)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    return (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)


def _popcount_fold(x: jnp.ndarray) -> jnp.ndarray:
    """Final byte-sum fold. Valid for per-byte values < 64 (i.e. sums of
    up to 7 words' stage-3 partials), so multi-word census pays ONE fold:
    popcount(a) + popcount(b) == fold(bytes(a) + bytes(b))."""
    x = x + (x >> 8)
    x = x + (x >> 16)
    return (x & jnp.uint32(0xFF)).astype(jnp.int32)


def _popcount(x: jnp.ndarray) -> jnp.ndarray:
    """SWAR popcount of a uint32 array (Mosaic-safe, no multiply)."""
    return _popcount_fold(_popcount_bytes(x))


def _hankel_doubling(ctx_row: jnp.ndarray, base: int, rows: int,
                     interpret: bool) -> jnp.ndarray:
    """Shift stack by log-doubling: row s = roll(ctx, base + s), s < rows.

    Equivalent to ``pltpu.roll(broadcast(ctx), base, 1, stride=1,
    stride_axis=0)`` but built from log2(rows) UNIFORM lane rotations with
    sublane-concat doubling: stage j doubles the stack with one roll by
    2^j. A per-sublane-varying rotate is the one pattern the VPU has no
    native form for — Mosaic lowers it to a masked-select cascade over
    the full [rows, cw] tile, which the roofline showed dominating the
    cost pass (the counted XOR+popcount ops explain less than a quarter
    of its time). Total doubling work is ~2 tile-areas of rolls + moves.

    ``ctx_row`` is [1, CW]; returns [rows, CW]. rows must be a power of
    two (the callers' XC/D are).
    """
    assert rows & (rows - 1) == 0, rows
    cw = ctx_row.shape[-1]

    def rot(x, k):
        if interpret:
            return jnp.roll(x, k, axis=1)
        return pltpu.roll(x, k % cw, 1)

    t = rot(ctx_row, base)
    size = 1
    while size < rows:
        t = jnp.concatenate([t, rot(t, size)], axis=0)
        size *= 2
    return t


def _md_shift(plane: jnp.ndarray, md: int) -> jnp.ndarray:
    """Right-shift a [..., W] right-view plane by min_disparity, clamped.

    vol_md[x, lane] = cost(left[x], right[x - md - lane]) equals the
    md = 0 roll-fanout applied to plane'[u] = plane[max(u - md, 0)] —
    the clamp compositions match the golden _shifted_stack exactly, and
    the invalid mask absorbs md via an x_offset - md origin. This keeps
    min_disparity OUT of the kernels (their 2-chunk context cannot reach
    d - 1 + md back when md > 0).
    """
    if md == 0:
        return plane
    lead = jnp.broadcast_to(
        plane[..., :1], plane.shape[:-1] + (md,)
    )
    return jnp.concatenate([lead, plane[..., :-md]], axis=-1)


def _cost_kernel(b_ref, cl_ref, cr_cur_ref, cr_prev_ref, out_ref, out_t_ref,
                 *, xc, d, bh, maxc, interpret, emit_t, words=1,
                 combine="hamming", margin=False, fanout="strided"):
    """One [W?, BH, XC] descriptor tile -> [BH, XC, D] (+ [XC, BH, D]) cost.

    Descriptor refs carry a leading words axis; multi-word census sums the
    per-word Hamming popcounts (``combine="hamming"``); the rank transform
    uses a single int32 word and absolute differences
    (``combine="absdiff"``). b_ref is the SMEM bounds vector
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
    # With a right-descriptor margin (``margin``: parallel/bands.py column
    # patches carry frame-true left context) chunk 0's predecessor is the
    # margin chunk — real data, no clamp (the margin array itself bakes in
    # the golden clamp where the context runs out).
    is_first = j == 0
    # The strided roll (tpu.dynamic_rotate) needs a 128-aligned lane
    # count; zero-pad the context on the right — the rolled garbage stays
    # right of the [XC, 2XC) window because dd <= D-1 <= XC never wraps.
    cw = 2 * xc + (-(2 * xc) % 128)
    ctxs = []
    for k in range(words):
        prev = cr_prev_ref[k]                                   # [BH, XC]
        cur = cr_cur_ref[k]
        if margin:
            parts = [prev, cur]
        else:
            col0 = jnp.broadcast_to(cur[:, :1], prev.shape)
            parts = [jnp.where(is_first, col0, prev), cur]
        if cw > 2 * xc:
            parts.append(jnp.zeros((bh, cw - 2 * xc), cur.dtype))
        ctxs.append(jnp.concatenate(parts, axis=1))             # [BH, CW]

    rows = []
    rows_t = []
    for r in range(bh):
        # Multi-word Hamming sums the per-byte SWAR partials across words
        # and folds ONCE (valid for <= 7 words; saves the per-word fold).
        pc = jnp.zeros((d, xc), jnp.uint32 if combine == "hamming"
                       else jnp.int32)
        for k in range(words):
            if fanout == "doubling" and d & (d - 1) == 0:
                shifted = _hankel_doubling(
                    ctxs[k][r : r + 1], 0, d, interpret
                )
            elif interpret:
                ctx_row = jnp.broadcast_to(ctxs[k][r : r + 1], (d, cw))
                u = jax.lax.broadcasted_iota(jnp.int32, (d, cw), 1)
                dd = jax.lax.broadcasted_iota(jnp.int32, (d, cw), 0)
                shifted = jnp.take_along_axis(
                    ctx_row, (u - dd) % cw, axis=1
                )
            else:
                ctx_row = jnp.broadcast_to(ctxs[k][r : r + 1], (d, cw))
                shifted = pltpu.roll(ctx_row, 0, 1, stride=1, stride_axis=0)
            win = shifted[:, xc : 2 * xc]                   # [D, XC]
            clr = jnp.broadcast_to(cl_ref[k][r : r + 1], (d, xc))
            if combine == "hamming":
                pc = pc + _popcount_bytes(jnp.bitwise_xor(clr, win))
            else:  # absdiff (rank descriptors, int32)
                pc = pc + jnp.abs(clr - win)
        if combine == "hamming":
            pc = _popcount_fold(pc)
        pc = jnp.where(invalid, maxc, pc).astype(out_ref.dtype)
        rows.append(pc.T[None])                             # [1, XC, D]
        if emit_t:
            rows_t.append(pc.T[:, None, :])                 # [XC, 1, D]
    out_ref[:] = jnp.concatenate(rows, axis=0)
    if emit_t:
        out_t_ref[:] = jnp.concatenate(rows_t, axis=1)


def _cost_kernel_x(b_ref, cl_ref, crv_cur_ref, crv_nxt_ref, out_ref,
                   out_t_ref, *, xc, d, bh, maxc, interpret, emit_t,
                   words=1, combine="hamming", margin=False, k_rev=1,
                   fanout="strided"):
    """x-major fan-out: one [XC, D] cost tile per row, near-zero transposes.

    The d-major kernel (_cost_kernel) builds [D, XC] tiles (sublane = d)
    and pays a [128, 128] transpose per ROW to emit the lane = d layouts
    downstream SGM consumes — the cost pass's dominant non-counted op
    (roofline: 0.45 TOPS vs the 1.5+ of the scan passes). Here the tile
    is [XC, D] (sublane = x, lane = d) DIRECTLY:

      cost(x, d) = combine(left(x), right(x - d))

    needs per sublane x a lane series right[x - d] — the lane index with
    NEGATIVE sign, which one strided roll provides once the right
    descriptor row is pre-REVERSED in XLA (an [H, W] pass, not
    [H, W, D]): with ctxr[u] = r[base - u],
    B[x', l] = ctxr[XC - 1 - x' + l] = roll(ctxr, CW - XC + 1,
    stride=1 per sublane)[x', l]. The left descriptor transposes ONCE
    per block·word ([BH, XC] -> [XC, BH], 1/BH-th of the old transposed
    bytes) so each row's column is a static [XC, 1] lane-broadcast.
    Both output layouts then assemble by pure concatenation.

    crv refs are chunks of the reversed (margin+padded) right plane:
    cur = reversed chunk K-1-(j+mj), nxt = its successor (holding the
    x-chunk LEFT of this block; aliases clamped when j+mj = 0 — the
    first-block column-0 clamp, as in _cost_kernel). ``k_rev`` = total
    reversed chunks (for bounds documentation only).
    """
    del k_rev
    j = pl.program_id(1)
    sub_x = jax.lax.broadcasted_iota(jnp.int32, (xc, d), 0)
    lane_d = jax.lax.broadcasted_iota(jnp.int32, (xc, d), 1)
    invalid = (b_ref[4] + j * xc + sub_x) < lane_d

    is_first = j == 0
    cw = 2 * xc + (-(2 * xc) % 128)
    off = (cw - xc + 1) % cw
    ctxs = []
    for k in range(words):
        cur = crv_cur_ref[k]                                    # [BH, XC]
        nxt = crv_nxt_ref[k]
        if margin:
            parts = [cur, nxt]
        else:
            # First block: context left of the frame clamps to column 0
            # (= reversed-cur's LAST lane), matching the golden
            # _shifted_stack clamp.
            clamp = jnp.broadcast_to(cur[:, xc - 1:], nxt.shape)
            parts = [cur, jnp.where(is_first, clamp, nxt)]
        if cw > 2 * xc:
            parts.append(jnp.zeros((bh, cw - 2 * xc), cur.dtype))
        ctxs.append(jnp.concatenate(parts, axis=1))             # [BH, CW]
    clts = [cl_ref[k].T for k in range(words)]                  # [XC, BH]

    rows = []
    rows_t = []
    for r in range(bh):
        # Multi-word Hamming: per-byte partial sums, one fold (see above).
        pc = jnp.zeros((xc, d), jnp.uint32 if combine == "hamming"
                       else jnp.int32)
        for k in range(words):
            if fanout == "doubling" and xc & (xc - 1) == 0:
                shifted = _hankel_doubling(
                    ctxs[k][r : r + 1], off, xc, interpret
                )
            elif interpret:
                ctx_row = jnp.broadcast_to(ctxs[k][r : r + 1], (xc, cw))
                u = jax.lax.broadcasted_iota(jnp.int32, (xc, cw), 1)
                s = jax.lax.broadcasted_iota(jnp.int32, (xc, cw), 0)
                shifted = jnp.take_along_axis(
                    ctx_row, (u - off - s) % cw, axis=1
                )
            else:
                ctx_row = jnp.broadcast_to(ctxs[k][r : r + 1], (xc, cw))
                shifted = pltpu.roll(ctx_row, off, 1, stride=1,
                                     stride_axis=0)
            b = shifted[:, :d]                                  # [XC, D]
            clc = jnp.broadcast_to(clts[k][:, r : r + 1], (xc, d))
            if combine == "hamming":
                pc = pc + _popcount_bytes(jnp.bitwise_xor(clc, b))
            else:  # absdiff (rank descriptors, int32)
                pc = pc + jnp.abs(clc - b)
        if combine == "hamming":
            pc = _popcount_fold(pc)
        pc = jnp.where(invalid, maxc, pc).astype(out_ref.dtype)
        rows.append(pc[None])                                   # [1, XC, D]
        if emit_t:
            rows_t.append(pc[:, None, :])                       # [XC, 1, D]
    out_ref[:] = jnp.concatenate(rows, axis=0)
    if emit_t:
        out_t_ref[:] = jnp.concatenate(rows_t, axis=1)


def _roll_cost_volume(
    cl: jnp.ndarray,
    cr: jnp.ndarray,
    cfg: StereoConfig,
    combine: str,
    interpret: bool = False,
    emit_transposed: bool = True,
    out_dtype=jnp.int16,
    x_offset=0,
    right_context: int = 0,
    fanout: str = "strided",
):
    """Shared roll-fanout volume builder over [words, H, W] descriptors.

    ``x_offset`` is the block's global x origin — column patches of a
    larger frame (parallel/bands.py) pass a static int, shard_map tiles
    (parallel/tiling.py) a traced scalar — so disparity-range invalidation
    matches the whole-frame pipeline.

    ``right_context``: cr is [words, H, W + ctx] with ctx frame-true
    columns of LEFT context (the columns preceding this block in the full
    frame). The disparity fan-out then reads true neighbour descriptors
    instead of the column-0 clamp, so interior costs are frame-exact
    WITHOUT extending the SGM domain over them (parallel/bands.py: this
    removes the +D left x-halo). Internally the context is realigned to a
    whole number of XC margin chunks; where ctx falls short of the D-1
    reach the margin edge-replicates, reproducing the golden clamp.

    Returns (cost [H, W, D], cost_whd [W, H, D] or None), identical to the
    golden per-pixel-descriptor cost volumes.
    """
    words, h, w = cl.shape
    d = cfg.num_disparities
    maxc = cfg.max_unary_cost
    # The transposed emit assembles [XC, BH, D] blocks by middle-dim
    # concatenation, which Mosaic only lowers when D fills the 128-lane
    # register (D=64 fails with "unsupported shape cast"). Smaller D
    # callers transpose in XLA instead (sgm_wta_fused_pallas handles
    # cost_whd=None).
    emit_transposed = emit_transposed and d >= 128

    bh = 8
    _, hp, _, wp = plan_dims(h, w, d)
    if jnp.dtype(out_dtype).itemsize == 1:
        # int8 volumes (census/rank costs <= window bits, exact in 8 bits —
        # see cost_volume_dtype) halve the volume's HBM traffic, but the
        # (32, 128) int8 tiling needs 32-row blocks for the transposed
        # [XC, BH, D] emit; fall back to int16 when the padded height or
        # the lane extent can't align.
        if hp % 32 == 0 and d % 128 == 0:
            bh = 32
        else:
            out_dtype = jnp.int16
    xc = wp if wp < max(d, 128) else max(d, 128)
    cl = jnp.pad(cl, ((0, 0), (0, hp - h), (0, wp - w)))
    if right_context:
        # Realign the context to M = whole XC chunks: target margin column
        # M-1 is the frame column just left of the block. Short context
        # edge-replicates (== the golden index clamp at wide column 0).
        m = -(-d // xc) * xc
        lead = cr[:, :, max(0, right_context - m) : right_context]
        if lead.shape[2] < m:
            fill = jnp.broadcast_to(
                cr[:, :, :1], (words, h, m - lead.shape[2])
            )
            lead = jnp.concatenate([fill, lead], axis=2)
        cr = jnp.concatenate([lead, cr[:, :, right_context:]], axis=2)
        mj = m // xc
    else:
        mj = 0
    cr = jnp.pad(cr, ((0, 0), (0, hp - h), (0, wp - w)))
    grid = (hp // bh, wp // xc)

    bounds = jnp.stack(
        [jnp.asarray(v) for v in (0, h, 0, w, x_offset)]
    ).astype(jnp.int32)

    if d >= 128:
        # x-major fan-out (see _cost_kernel_x): no per-row transposes.
        # The right plane reverses in XLA ([H, W]-scale, not [H, W, D]).
        crv = cr[:, :, ::-1]
        k_rev = (mj * xc + wp) // xc
        im_cur = lambda i, j: (0, i, k_rev - 1 - (j + mj))
        im_nxt = lambda i, j: (
            0, i, jnp.minimum(k_rev - (j + mj), k_rev - 1)
        )
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
            _cost_kernel_x, xc=xc, d=d, bh=bh, maxc=maxc,
            interpret=interpret, emit_t=emit_transposed, words=words,
            combine=combine, margin=mj > 0, k_rev=k_rev, fanout=fanout,
        )
        if not emit_transposed:
            kernel = functools.partial(
                lambda b_r, cl_r, cc_r, cn_r, o_r, **kw: _cost_kernel_x(
                    b_r, cl_r, cc_r, cn_r, o_r, None, **kw
                ),
                xc=xc, d=d, bh=bh, maxc=maxc, interpret=interpret,
                emit_t=False, words=words, combine=combine, margin=mj > 0,
                k_rev=k_rev, fanout=fanout,
            )
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((words, bh, xc), lambda i, j: (0, i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((words, bh, xc), im_cur,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((words, bh, xc), im_nxt,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shapes,
            compiler_params=_VMEM_PARAMS,
            interpret=interpret,
        )(bounds, cl, crv, crv)
        return outs[0], (outs[1] if emit_transposed else None)

    im = lambda i, j: (0, i, j)
    im_r = lambda i, j: (0, i, j + mj)
    im_prev = lambda i, j: (0, i, jnp.maximum(j + mj - 1, 0))
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
        emit_t=emit_transposed, words=words, combine=combine,
        margin=mj > 0, fanout=fanout,
    )
    if not emit_transposed:
        kernel = functools.partial(
            lambda b_r, cl_r, cc_r, cp_r, o_r, **kw: _cost_kernel(
                b_r, cl_r, cc_r, cp_r, o_r, None, **kw
            ),
            xc=xc, d=d, bh=bh, maxc=maxc, interpret=interpret, emit_t=False,
            words=words, combine=combine, margin=mj > 0, fanout=fanout,
        )

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((words, bh, xc), im, memory_space=pltpu.VMEM),
            pl.BlockSpec((words, bh, xc), im_r, memory_space=pltpu.VMEM),
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


def census_cost_volume_pallas(
    left: jnp.ndarray,
    right: jnp.ndarray,
    cfg: StereoConfig,
    interpret: bool = False,
    emit_transposed: bool = True,
    out_dtype=jnp.int16,
    x_offset=0,
    right_context: int = 0,
    fanout: str = "strided",
):
    """Census-Hamming cost volume on TPU (any census word count).

    ``right_context``: right is [H, W + ctx] with ctx frame-true columns
    prepended (see _roll_cost_volume) — bit-exact vs the golden
    census_cost_volume with the same context.

    Returns (cost [H, W, D], cost_whd [W, H, D] or None), int16, identical
    to the golden census_cost_volume.
    """
    if cfg.cost_fn != "census":
        raise NotImplementedError("census cost kernel: cfg.cost_fn != census")
    # [words, H, W] uint32 descriptor planes
    md = int(cfg.min_disparity)
    cl = jnp.moveaxis(census_transform(left, cfg.census_window), -1, 0)
    cr = jnp.moveaxis(census_transform(right, cfg.census_window), -1, 0)
    return _roll_cost_volume(
        cl, _md_shift(cr, md), cfg, "hamming", interpret=interpret,
        emit_transposed=emit_transposed, out_dtype=out_dtype,
        x_offset=x_offset - md, right_context=right_context, fanout=fanout,
    )


def rank_cost_volume_pallas(
    left: jnp.ndarray,
    right: jnp.ndarray,
    cfg: StereoConfig,
    interpret: bool = False,
    emit_transposed: bool = True,
    out_dtype=jnp.int16,
    x_offset=0,
    right_context: int = 0,
    fanout: str = "strided",
):
    """Rank-transform |rank_l - rank_r| cost volume on TPU.

    Same roll-fanout kernel as census with a single int32 descriptor word
    and an absolute-difference combine. Bit-exact vs the golden
    rank_cost_volume (``right_context`` as in census_cost_volume_pallas).
    """
    if cfg.cost_fn != "rank":
        raise NotImplementedError("rank cost kernel: cfg.cost_fn != rank")
    md = int(cfg.min_disparity)
    rl = rank_transform(left, cfg.census_window)[None]      # [1, H, W] i32
    rr = rank_transform(right, cfg.census_window)[None]
    return _roll_cost_volume(
        rl, _md_shift(rr, md), cfg, "absdiff", interpret=interpret,
        emit_transposed=emit_transposed, out_dtype=out_dtype,
        x_offset=x_offset - md, right_context=right_context, fanout=fanout,
    )


# ---------------------------------------------------------------------------
# SAD block-matching kernel: d-fanout fused with the box filter.
# ---------------------------------------------------------------------------


def _floor_div_const(x: jnp.ndarray, c: int) -> jnp.ndarray:
    """Exact floor division of non-negative int32 by a static constant.

    Mosaic has no integer divide; a float32 reciprocal multiply is exact to
    +-1 for |x| < 2^24, and one integer correction step removes the +-1.
    """
    if c == 1:
        return x
    q = (x.astype(jnp.float32) * jnp.float32(1.0 / c)).astype(jnp.int32)
    r = x - q * c
    q = q + (r >= c).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    return q


def sad_kernel_supported(cfg: StereoConfig, h: int, w: int) -> bool:
    """Whether the fused SAD kernel handles this (config, frame) pair.

    The row band needs the full window height in VMEM (wy <= 17) and the
    per-program AD slab (bh + 2*ry context rows of [D, WCTX] int32) must
    fit comfortably; larger cases use the golden XLA path.
    """
    if cfg.cost_fn != "sad":
        return False
    wy, wx = cfg.sad_window
    if wy % 2 == 0 or wx % 2 == 0 or wy // 2 > 8:
        return False
    d = cfg.num_disparities
    if d < 8:
        return False
    _, hp, _, wp = plan_dims(h, w, d)
    cpad = -(-(d + wx // 2) // 128) * 128
    wctx = cpad + wp + wx // 2
    wctx += -wctx % 128
    slab = (8 + 2 * (wy // 2)) * d * wctx * 4
    return slab <= 48 * (1 << 20)


def _sad_kernel(b_ref, lp_ref, lc_ref, ln_ref, rp_ref, rc_ref, rn_ref,
                out_ref, *, d, wy, wx, wp, cpad, maxc, area, w_true,
                interpret):
    """One 8-row output band of the SAD volume, box filter fused in.

    Input refs are [BH, WCTX] int32 rows of the EDGE-PADDED images
    (previous / current / next row blocks supply the +-ry window halo; the
    cpad left columns replicate column 0 so the per-sublane roll lands on
    the golden clamp R[max(x-d, 0)], and the right columns replicate
    column w-1). b_ref[0] is the block's global x origin (possibly a
    traced tile offset) for disparity-range invalidation.

    The golden box filter edge-replicates the AD array itself, so lanes
    beyond the frame edge are patched to the AD at column w-1 before
    summing — that is the one place replicated-image AD differs from
    replicated-AD.
    """
    bh = 8
    ry, rx = wy // 2, wx // 2
    wctx = lc_ref.shape[1]
    edge_lane = cpad + w_true - 1

    lane = jax.lax.broadcasted_iota(jnp.int32, (d, wctx), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (d, wctx), 0)

    def ctx_row(refs, r_off):
        off = bh - ry + r_off
        if off < bh:
            return refs[0][off : off + 1]
        if off < 2 * bh:
            return refs[1][off - bh : off - bh + 1]
        return refs[2][off - 2 * bh : off - 2 * bh + 1]

    ad_rows = []
    for r_off in range(bh + 2 * ry):
        lrow = ctx_row((lp_ref, lc_ref, ln_ref), r_off)     # [1, WCTX]
        rrow = ctx_row((rp_ref, rc_ref, rn_ref), r_off)
        rctx = jnp.broadcast_to(rrow, (d, wctx))
        if interpret:
            shifted = jnp.take_along_axis(rctx, (lane - sub) % wctx, axis=1)
        else:
            shifted = pltpu.roll(rctx, 0, 1, stride=1, stride_axis=0)
        ad = jnp.abs(jnp.broadcast_to(lrow, (d, wctx)) - shifted)
        edge = jax.lax.slice(ad, (0, edge_lane), (d, edge_lane + 1))
        ad = jnp.where(lane > edge_lane, jnp.broadcast_to(edge, ad.shape), ad)
        ad_rows.append(ad)

    lane_o = jax.lax.broadcasted_iota(jnp.int32, (d, wp), 1)
    sub_o = jax.lax.broadcasted_iota(jnp.int32, (d, wp), 0)
    invalid = (b_ref[0] + lane_o) < sub_o

    v = ad_rows[0]
    for r_off in range(1, wy):
        v = v + ad_rows[r_off]
    rows_out = []
    for r in range(bh):
        if r > 0:
            v = v + ad_rows[r + wy - 1] - ad_rows[r - 1]
        hsum = jax.lax.slice(v, (0, cpad - rx), (d, cpad - rx + wp))
        for o in range(1, wx):
            hsum = hsum + jax.lax.slice(
                v, (0, cpad - rx + o), (d, cpad - rx + o + wp)
            )
        cost = _floor_div_const(hsum, area)
        cost = jnp.where(invalid, maxc, cost).astype(out_ref.dtype)
        # Transpose [D, WP] -> [WP, D] in 128-lane chunks (the proven
        # census-kernel shape; one big transpose trips Mosaic on wide WP).
        step = 128 if wp % 128 == 0 else wp
        chunks = [
            jax.lax.slice(cost, (0, c0), (d, c0 + step)).T
            for c0 in range(0, wp, step)
        ]
        col = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, 0)
        rows_out.append(col[None])                          # [1, WP, D]
    out_ref[:] = jnp.concatenate(rows_out, axis=0)


def sad_cost_volume_pallas(
    left: jnp.ndarray,
    right: jnp.ndarray,
    cfg: StereoConfig,
    interpret: bool = False,
    out_dtype=jnp.int16,
    x_offset=0,
    right_context: int = 0,
):
    """SAD block-matching cost volume on TPU, box filter fused.

    Bit-exact vs the golden sad_cost_volume (same local edge-replication
    and x-d clamp semantics); ``x_offset`` may be a traced tile origin.

    Returns (cost PADDED [hp, wp, D] int16, None) — plan_dims padding, the
    shape sgm_wta_fused_pallas consumes with true_shape=(h, w).
    """
    if cfg.cost_fn != "sad":
        raise NotImplementedError("sad cost kernel: cfg.cost_fn != sad")
    if right_context:
        # The fused box filter's edge-replication is defined on the local
        # slice; context-extended SAD stays on the golden path.
        raise NotImplementedError("sad kernel: right_context unsupported")
    h, w = left.shape
    if not sad_kernel_supported(cfg, h, w):
        raise NotImplementedError("sad kernel unsupported for this config")
    d = cfg.num_disparities
    wy, wx = cfg.sad_window
    ry, rx = wy // 2, wx // 2
    area = wy * wx
    bh = 8
    _, hp, _, wp = plan_dims(h, w, d)
    cpad = -(-(d + rx) // 128) * 128

    # Lane count must be 128-aligned for the strided roll; the extra
    # right columns are edge replicas past the AD window and the frame-
    # edge patch overrides everything right of w-1 anyway.
    wctx = cpad + wp + rx
    wctx += -wctx % 128
    md = int(cfg.min_disparity)
    pads = ((bh, hp - h + bh), (cpad, wctx - cpad - w))
    pl_img = jnp.pad(left.astype(jnp.int32), pads, mode="edge")
    # min_disparity composes as a clamped right-shift of the right image
    # (see _md_shift) with an x_offset - md invalid origin.
    pr_img = jnp.pad(
        _md_shift(right.astype(jnp.int32), md), pads, mode="edge"
    )

    grid = (hp // bh,)
    row = lambda k: (lambda i: (i + k, 0))
    img_spec = lambda k: pl.BlockSpec((bh, wctx), row(k),
                                      memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _sad_kernel, d=d, wy=wy, wx=wx, wp=wp, cpad=cpad,
        maxc=cfg.max_unary_cost, area=area, w_true=w, interpret=interpret,
    )
    bounds = jnp.asarray(x_offset - md, jnp.int32)[None]
    cost = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [img_spec(k) for k in range(3)] * 2,
        out_specs=pl.BlockSpec((bh, wp, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp, d), out_dtype),
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(bounds, pl_img, pl_img, pl_img, pr_img, pr_img, pr_img)
    return cost, None  # PADDED [hp, wp, D] (plan_dims)
