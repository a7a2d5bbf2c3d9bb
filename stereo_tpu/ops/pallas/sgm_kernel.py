"""Fused SGM path aggregation as Pallas TPU kernels.

The flagship kernels (SURVEY.md §2.1 C6). The reference enqueues one OpenCL
kernel per path direction, each re-streaming the cost volume; here all 4/8
Hirschmueller paths run in four blocked passes over the HBM-resident
volume, each shaped to keep the VPU full:

  * horizontal kernels (one per direction): grid = (row_blocks, x_chunks)
    with the x-chunk axis minor, so a TALL [BR~64, D] scan slab steps
    through x while the carry persists in VMEM scratch across chunk steps.
    Tall blocks matter: a VMEM-resident [rows, W, D] design is limited to
    ~8 rows, wastes the 8x128 VPU on skinny slabs, and goes latency-bound
    on W sequential steps (measured 72 ms vs a few ms at KITTI scale).
  * vertical kernels (one per scan direction): the grid walks row blocks
    top-down (bottom-up for the reverse pass via a reversed index_map),
    each grid step adding top-to-bottom + down-right + down-left rows
    (resp. the three up paths) with full [W, D] row carries persisting in
    VMEM scratch across grid steps. A diagonal path is just the vertical
    carry shifted one pixel along the sublane (x) axis — no shearing, no
    extra memory traffic, and each row update is one wide VPU slab.

All passes accumulate into one summed volume via input/output aliasing:
S traffic is one write + three read-modify-writes regardless of path
count. Fresh-start masking uses GLOBAL row/column indices, so padding to
block multiples never leaks into real pixels. Compute runs in
float32 by default — integer VPU ops measured ~3x slower than f32 on v5e,
and f32 is exact for these integer-valued costs (|values| < 2^24); HBM
traffic uses the caller's dtype (int16 recommended: L <= max_unary_cost +
P2 and 8-path sums < 2^15).

Bit-exact oracle: stereo_tpu.ops.sgm.sgm_aggregate
(tests/ops/test_pallas_sgm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import StereoConfig

_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * (1 << 20))
#: The fused v-up epilogue at config-4 scale (wp=3072, D=256, bhf=8)
#: needs 121.6 MB of scoped VMEM (round-5 whole-frame probe: every OTHER
#: kernel compiles whole-frame; the old "helper exit code 1" ceiling
#: resolved to this precise stack OOM). v5e VMEM is 128 MB; giving the
#: one biggest kernel a higher cap lets whole-frame config 4 compile.
_VMEM_PARAMS_FUSED = pltpu.CompilerParams(vmem_limit_bytes=126 * (1 << 20))

#: SMEM bounds vector layout shared by every kernel in this module:
#: (y_lo, y_hi, x_lo, x_hi, x0). [y_lo, y_hi) x [x_lo, x_hi) is the
#: in-frame rectangle of the block in LOCAL coordinates — SGM carries
#: fresh-start at its edges, exactly like the golden masked recurrence
#: (ops/sgm.py valid-mask semantics restricted to rectangles, which is
#: all the halo tiling in parallel/tiling.py ever produces). x0 is the
#: block's GLOBAL x origin (possibly a traced scalar: tile offsets come
#: from lax.axis_index), used for disparity-range framing in the fused
#: epilogue. Whole-frame callers pass (0, h, 0, w, x_offset).
N_BOUNDS = 5


def frame_bounds(h, w, x_offset=0, y_offset=0, image_width=None,
                 image_height=None):
    """Build the SMEM bounds vector for a [h, w] block of a larger frame.

    Offsets may be traced scalars (tile origins). ``image_*`` default to
    treating the block as the whole frame.
    """
    ih = image_height if image_height is not None else h
    iw = image_width if image_width is not None else w
    y_lo = jnp.clip(-y_offset, 0, h)
    y_hi = jnp.clip(ih - y_offset, 0, h)
    x_lo = jnp.clip(-x_offset, 0, w)
    x_hi = jnp.clip(iw - x_offset, 0, w)
    return jnp.stack(
        [jnp.asarray(v) for v in (y_lo, y_hi, x_lo, x_hi, x_offset)]
    ).astype(jnp.int32)


_SMEM_SPEC = pl.BlockSpec(memory_space=pltpu.SMEM)


#: Blocking knobs, swept on hardware (docs/kernels.md). _BR_CAP bounds the
#: horizontal-pass row-block height (taller slabs amortize the per-step
#: D-wide min reduction better; the whole-frame carry still fits VMEM).
#: _XC is the horizontal x-chunk; _V_BLOCK_BYTES / _V_BH_CAP bound the
#: vertical-pass row block.
_BR_CAP = 128
_XC = 64
_V_BLOCK_BYTES = 2 << 20
_V_BH_CAP = 8
#: Row block of the fused v-up pass. Must be a multiple of 8 (2-D output
#: blocks need an 8-divisible second-to-last dim); values > 8 amortize
#: the per-grid-step setup (adaptive map relayout, carry reloads) over
#: more rows at higher VMEM residency. Hardware sweep (round 4, KITTI
#: D=128, ms/frame full chain): fixed 7.47/7.34/7.35/7.28 and adaptive
#: 10.23/10.00/9.93/9.90 at bh 8/16/24/32 — bit-identical throughout.
#: 32 OOMed the 100 MB scoped-VMEM budget inside the FULL pipeline
#: program (117.6 MB: the unrolled epilogue keeps ~6 [W, D] f32 temps
#: live per row), so 16 ships — most of the gain at half the residency.
_V_FUSED_BH = 16
#: Lane-pack small-D volumes (G = 128/D scanlines or x per lane group);
#: module knob so hardware sweeps can compare against the unpacked path.
_PACK_SMALL_D = True
#: Adaptive-P2 h-pass CP streams (VERDICT r4 #2, ADOPTED round 5):
#: stream CP = C + P2_eff per horizontal direction instead of
#: broadcasting the per-step map value inside the latency chain (see
#: _h_kernel cp_mode). Measured at KITTI scale, quality preset: h passes
#: 4.07 -> 3.38 ms (staged A/B incl. CP build), END-TO-END fused
#: pipeline 9.47 -> 8.77 ms (105.6 -> 114.1 fps), bit-identical on
#: device. d >= 128 unrolled whd form only (small-D segs keep maps: the
#: packed-map layout is already lane-shaped and relayout-free). The same
#: identity for the V passes is a measured-reasoning negative: 3 CP
#: volumes per pass cost ~0.5 ms of XLA build each against v taxes of
#: +0.4-0.6 ms, and v_down's +0.19 (r4) shows the map plumbing is
#: near-free where the pass is throughput-bound.
_ADAPTIVE_CP_H = True
#: Horizontal-pass intra-kernel ILP: split the [BR, D] row block into
#: this many independent carry chains (rows never interact in an h
#: scan, so the split is bit-identical by construction) so the Mosaic
#: scheduler can interleave the dependent min/add chains of the serial
#: x loop — the pass is latency-bound (round-3 finding 4: ~1.5 TOPS vs
#: the 3.85 derived peak, "closing to 3 TOPS would save ~0.8 ms").
#: Hardware sweep (round 5, KITTI 375x1242 D=128, full fused pipeline,
#: chained timer, 3 same-session A/Bs): headline preset 7.48-7.59 ms at
#: ilp=1 vs 7.28-7.37 at ilp=2; quality preset 9.04-9.24 vs 8.71-8.74;
#: ilp=4 LOSES on both (7.69 / 9.13 — register pressure: 4 carries plus
#: the unrolled slab list exceed what the scheduler can keep resident).
#: Bit-identical on device at every ilp. 2 ships.
_H_ILP = 2


def _v_block_rows(hp, wp, d, itemsize):
    """Rows per vertical-pass grid step (divides hp, bounded by budget)."""
    bh = max(1, min(_V_BH_CAP, _V_BLOCK_BYTES // (wp * d * itemsize)))
    while hp % bh:
        bh -= 1
    return bh


def _fused_block_rows(hp, wp, d, itemsize):
    """Row block of the fused v-up pass (see _V_FUSED_BH).

    Multiple of 8 dividing hp, shrunk toward the ~6 MB S-block budget:
    the unrolled epilogue keeps ~6 [W, D] f32 temporaries live per row,
    so wide volumes at bh=16 blew the compile helper / scoped VMEM
    (config-4 D=256 patches) while bh=16 at KITTI D=128 passes.

    8 is the FLOOR regardless of the byte budget (ADVICE r4): an 8-row
    block is the smallest legal 2-D output tile, so very wide volumes
    (e.g. config-4 D=256 at wp~2944: 8*2944*256*2 ~= 12 MB) ship over
    budget — the budget trades speed for residency, it is not a VMEM
    guarantee; callers above the Mosaic ceiling split the frame
    (parallel/bands.py) instead.
    """
    bhf = _V_FUSED_BH
    while bhf > 8 and (bhf % 8 or hp % bhf
                       or bhf * wp * d * max(itemsize, 2) > (6 << 20)):
        bhf -= 8
    if bhf < 8 or hp % bhf:
        bhf = 8 if hp % 8 == 0 else 1
    return bhf


def plan_dims(h, w, d):
    """Shared padding plan for the cost + SGM kernels.

    (br, hp, xc, wp): horizontal-pass row block and padded H; horizontal
    x-chunk and padded W. W pads to the cost kernel's chunk (max(D, 128))
    so the cost kernel's transposed output feeds the horizontal passes
    directly; both are multiples of the SGM x-chunk. br rounds up to 32
    when the cap allows so int8 volumes keep their (32, 128) tiling.
    """
    br = min(_BR_CAP, -(-h // 8) * 8)
    if br % 32 and -(-br // 32) * 32 <= _BR_CAP:
        br = -(-br // 32) * 32
    hp = -(-h // br) * br
    xcc = max(d, 128)
    if w >= xcc:
        wp = -(-w // xcc) * xcc
        xc = _XC
    else:
        wp = max(-(-w // 8) * 8, d)
        xc = wp
    return br, hp, xc, wp


def _adaptive_maps(image, cfg, h, w, hp, wp, ct):
    """Per-direction effective-P2 maps, padded + laid out for the kernels.

    Adaptive P2 (cfg.adaptive_p2, Hirschmueller '08) depends only on the
    image gradient along each path — never on the scan carry — so it
    precomputes in XLA (ops/sgm.py adaptive_p2_map: exact int division)
    and rides into the kernels as small 2-D side inputs (~8 * H * W * 4
    bytes vs the volume's O(H * W * D) traffic).

    Returns (h_fwd_t, h_rev_t, v_dn, v_up):
      * h_*_t: (wp, hp) transposed maps matching the horizontal passes'
        scan layout (predecessors x-1 / x+1);
      * v_dn / v_up: (hp, n_maps, wp) row-interleaved stacks ordered
        (vertical, diag A, diag B) — predecessors (y∓1, x), (y∓1, x-1),
        (y∓1, x+1) — shaped so any BH row blocking keeps legal minors.
    """
    from ..sgm import adaptive_p2_map

    if image is None:
        raise ValueError(
            "cfg.adaptive_p2 requires the reference image (image=...)"
        )
    if image.shape != (h, w):
        raise ValueError(f"image shape {image.shape} != frame {(h, w)}")

    def m(dy, dx):
        # Integer-valued and small (<= max(P2, p2_min)): exact in f32.
        return adaptive_p2_map(image, cfg, dy, dx).astype(ct)

    def pad(full):
        return jnp.pad(full, ((0, hp - h), (0, wp - w)))

    # Each direction's map is a SHIFT of its opposite's:
    # grad_{+r}(p) = |I(p) - I(p + r)| = grad_{-r}(p + r), so only the
    # four "down/forward" maps run the gradient + division; the four
    # opposites are one roll each (entries whose predecessor falls
    # outside the frame are don't-care — the scans fresh-start there —
    # so the roll's wrap is harmless). Halves the per-frame map
    # precompute (round-4 adaptive roofline).
    h_fwd = m(0, -1)
    h_rev = jnp.roll(h_fwd, -1, axis=1)
    h_fwd_t = jnp.transpose(pad(h_fwd))
    h_rev_t = jnp.transpose(pad(h_rev))
    diag = cfg.num_paths == 8
    v0 = m(-1, 0)
    dn = [v0]
    up = [jnp.roll(v0, -1, axis=0)]
    if diag:
        a = m(-1, -1)
        b = m(-1, +1)
        dn += [a, b]
        # up diag A has predecessor (y+1, x-1) = shift of b = m(-1, +1);
        # up diag B has predecessor (y+1, x+1) = shift of a = m(-1, -1).
        up += [jnp.roll(b, (-1, +1), (0, 1)), jnp.roll(a, (-1, -1), (0, 1))]
    dn = [pad(x) for x in dn]
    up = [pad(x) for x in up]
    return h_fwd_t, h_rev_t, jnp.stack(dn, axis=1), jnp.stack(up, axis=1)


def _pack_map_lanes(m: jnp.ndarray, g: int, seg: int) -> jnp.ndarray:
    """[..., W] adaptive-P2 map -> packed [..., W//G, G*seg] lane layout.

    Matches the packed cost volume's reshape (G adjacent scan positions
    share the lane axis, lane = grp*seg + rd): the map value at position
    x = xg*G + grp repeats over its segment's seg disparity lanes, so the
    segmented recurrence (_seg_upd) reads per-lane effective P2 with no
    in-kernel relayout at all.
    """
    lead = m.shape[:-1]
    w = m.shape[-1]
    r = m.reshape(*lead, w // g, g, 1)
    r = jnp.broadcast_to(r, (*lead, w // g, g, seg))
    return r.reshape(*lead, w // g, g * seg)


def _upd(n: jnp.ndarray, p1, p2, use_roll: bool = False) -> jnp.ndarray:
    """Candidate term of the SGM recurrence on a NORMALIZED carry.

    n: [..., D] f32/int32, n = L_prev - min_k L_prev (per-pixel
    normalized, so min over lanes is 0). Returns
    t = min(n, n<<1 + P1, n>>1 + P1, P2) with edge-replicated d+-1
    shifts (the replica never wins for P1 >= 0); the caller forms
    L = C + t and renormalizes the next carry with _renorm. Algebra:
    min(L, L<<1+P1, L>>1+P1, m+P2) - m == min(n, n<<1+P1, n>>1+P1, P2)
    since the d+-1 shifts never cross pixels — carrying n instead of L
    turns the m+P2 add into a direct min operand (one VPU op per step)
    and moves the lane reduction to _renorm (same count, after the add
    of C). Exact: integer-valued f32 throughout.
    """
    if use_roll:
        # Lane rotates + edge fix; candidate alternative to concatenate.
        d = n.shape[-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, n.shape, n.ndim - 1)
        dn = jnp.where(lane == 0, n, pltpu.roll(n, 1, n.ndim - 1))
        up = jnp.where(
            lane == d - 1, n, pltpu.roll(n, d - 1, n.ndim - 1)
        )
    else:
        dn = jnp.concatenate([n[..., :1], n[..., :-1]], axis=-1)
        up = jnp.concatenate([n[..., 1:], n[..., -1:]], axis=-1)
    # ONE +p1 after min(dn, up) instead of two before it (exact: integer-
    # valued f32 adds commute with min) — saves a VPU op per step.
    return jnp.minimum(jnp.minimum(n, p2), jnp.minimum(dn, up) + p1)


def _renorm(l: jnp.ndarray) -> jnp.ndarray:
    """L -> normalized carry n = L - min_k L (the _upd invariant)."""
    return l - jnp.min(l, axis=-1, keepdims=True)


def _upd_lcarry(prev: jnp.ndarray, p1, p2, use_roll: bool = False):
    """_upd on an UNNORMALIZED carry (prev = L): min(prev, prev<<1 + P1,
    prev>>1 + P1, m + P2) - m.

    One VPU op more than _upd + _renorm, but the next step's reduction
    (min over prev) and its shifts start from the SAME value, so the
    per-step serial chain is shorter. The horizontal passes use this:
    their [BR, D] slabs are ~16 tiles and W sequential steps leave them
    latency-sensitive — measured 3.75 ms (this form) vs 4.06 ms
    (normalized) for the two h passes at KITTI scale, while the wide
    [W, D] vertical slabs hide the chain and win with _upd (5.9 -> 4.9 ms
    across the v families + epilogue).
    """
    m = jnp.min(prev, axis=-1, keepdims=True)
    if use_roll:
        d = prev.shape[-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, prev.shape, prev.ndim - 1)
        dn = jnp.where(lane == 0, prev, pltpu.roll(prev, 1, prev.ndim - 1))
        up = jnp.where(
            lane == d - 1, prev, pltpu.roll(prev, d - 1, prev.ndim - 1)
        )
    else:
        dn = jnp.concatenate([prev[..., :1], prev[..., :-1]], axis=-1)
        up = jnp.concatenate([prev[..., 1:], prev[..., -1:]], axis=-1)
    cand = jnp.minimum(
        jnp.minimum(prev, m + p2), jnp.minimum(dn, up) + p1
    )
    return cand - m


def _seg_upd_lcarry(prev, p1, p2, r):
    """_upd_lcarry restricted to lane segments of size r (see _seg_upd)."""
    g = _seg_lane(prev.shape, r)
    m = prev
    s = 1
    while s < r:
        main = _rot(m, s)
        wrap = _rot(m, s - r)
        m = jnp.minimum(m, jnp.where(g < r - s, main, wrap))
        s *= 2
    dn = jnp.where(g == 0, prev, _rot(prev, -1))
    up = jnp.where(g == r - 1, prev, _rot(prev, 1))
    cand = jnp.minimum(
        jnp.minimum(prev, m + p2), jnp.minimum(dn, up) + p1
    )
    return cand - m


def _rot(x, s):
    """Lane rotate by +s: out[..., i] = x[..., (i + s) % d].

    Expressed as a concat of two static lane slices, which Mosaic lowers
    as shifts (works compiled and in interpret mode alike).
    """
    if s == 0:
        return x
    return jnp.concatenate([x[..., s:], x[..., :s]], axis=-1)


def _seg_lane(shape, r):
    """lane % r iota (r a power of two dividing the lane extent)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return lane & (r - 1)


def _seg_upd(n, p1, p2, r):
    """_upd restricted to independent lane SEGMENTS of size r.

    The lane axis packs G = d // r independent problems (adjacent
    scanlines in the horizontal passes, adjacent x in the vertical
    passes), each with an r-wide disparity range: d+-1 shifts replicate
    at segment edges. ``n`` is the per-segment NORMALIZED carry
    (_seg_renorm), so the min_k candidate is P2 directly.
    Bit-identical to running _upd per segment.
    """
    g = _seg_lane(n.shape, r)
    dn = jnp.where(g == 0, n, _rot(n, -1))
    up = jnp.where(g == r - 1, n, _rot(n, 1))
    return jnp.minimum(jnp.minimum(n, p2), jnp.minimum(dn, up) + p1)


def _seg_renorm(l, r):
    """L -> per-SEGMENT normalized carry: subtract each r-lane segment's
    min, computed by a rotate butterfly (all lanes of a segment end up
    holding the segment min)."""
    g = _seg_lane(l.shape, r)
    m = l
    s = 1
    while s < r:
        # within-segment rotate by +s: wrap lanes take the second rotate
        main = _rot(m, s)
        wrap = _rot(m, s - r)
        m = jnp.minimum(m, jnp.where(g < r - s, main, wrap))
        s *= 2
    return l - m


def _h_kernel(*refs, p1, p2, xc, reverse, accumulate, adaptive=False,
              ct=jnp.int32, use_roll=False, out_hwd=False, seg=None,
              in_hwd=False, cp_mode=False, ilp=1):
    """One horizontal direction over a [XC, BR, D] block of the TRANSPOSED
    (W, H, D) volume.

    Refs, in order: bounds (SMEM), cost block, [p2 map block if adaptive],
    [accumulator block if accumulate], output block, carry scratch.

    b_ref: SMEM bounds vector (see N_BOUNDS). The scan fresh-starts at the
    frame edge of its direction: every x <= x_lo for the forward pass,
    every x >= x_hi - 1 for the reverse pass — matching the golden masked
    recurrence (invalid predecessors reset the carry to L = C) on the
    rectangular in-frame region; out-of-rect columns hold garbage the
    caller crops.

    The scan axis must be the untiled depth dimension: Mosaic cannot load a
    dynamically indexed single sublane (cost[:, x, :]) from a tiled dim, so
    the wrapper hands this kernel the volume transposed to (W, H, D) and
    the scan is plain cost_ref[x]. EXCEPT with ``in_hwd`` (requires the
    unrolled ``out_hwd`` form): the x indices are then STATIC Python ints,
    so the block is the [BR, XC, D] slice of the (H, W, D) volume itself
    and each step reads the static sublane slice cost_ref[:, x, :] —
    removing the transposed volume (and its cost-kernel emission, a
    measured 0.445 ms/frame at KITTI scale) entirely.

    Adaptive P2 (Hirschmueller '08): p2_ref is a [XC, BR] block of the
    per-pixel effective-P2 map for THIS direction (ops/sgm.py
    adaptive_p2_map, precomputed in XLA so the int division is exact),
    sharing the cost block's transposed layout; each step loads one
    [1, BR] row and transposes it to a [BR, 1] sublane column — the only
    relayout Mosaic needs (a strided lane slice of a (BR, XC) block would
    violate the (8, 128) block-minor rule).

    With out_hwd=True the x loop is UNROLLED and the XC result slabs are
    concatenated into one [BR, XC, D] write — emitting the accumulator
    directly in (H, W, D) layout for the vertical passes, which removes
    the XLA transpose between pass families (~2.4 ms at KITTI scale).

    Grid = (row_blocks, x_chunks) with the chunk axis minor; chunks sweep
    left-to-right (right-to-left when reverse, via the index_map).
    carry_ref [BR, D] persists across chunk steps; its stale value from
    the previous row block is masked off at the global scan origin.
    """
    it = iter(refs)
    b_ref, cost_ref = next(it), next(it)
    p2_ref = next(it) if adaptive else None
    acc_ref = next(it) if accumulate else None
    out_ref, carry_ref = next(it), next(it)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    dt = out_ref.dtype
    chunk = (nj - 1 - j) if reverse else j
    x_lo = b_ref[2]
    x_hi = b_ref[3]

    def p2_at(x):
        if not adaptive:
            return p2
        if seg:
            # Packed-map layout (see _pack_map_lanes): the [XC, BRK, DK]
            # block already carries the per-lane effective P2, so each
            # step is a plain leading-dim load — no relayout at all.
            return p2_ref[x]                           # [BRK, DK]
        return jnp.transpose(p2_ref[pl.ds(x, 1), :])   # [BR, 1]

    # L-carry form: the horizontal scan is latency-bound (see _upd_lcarry).
    if seg:
        upd = lambda prev, p2x: _seg_upd_lcarry(prev, p1, p2x, seg)
    else:
        upd = lambda prev, p2x: _upd_lcarry(prev, p1, p2x, use_roll)
    renorm = lambda l: l

    def _rows(arr, k):
        # k-th of the ilp independent row groups (_H_ILP): a static
        # sublane slice, 8-aligned by the h_call gate. Rows never
        # interact in a horizontal scan, so per-group chains are
        # bit-identical to the single chain.
        if ilp == 1:
            return arr
        rb = arr.shape[0] // ilp
        return arr[k * rb:(k + 1) * rb]

    def _assemble(slab_groups):
        # slab_groups[k][x] is the k-th row group's [BRG, 1, D] result at
        # step x; concatenation happens once, outside the serial chain.
        cols = [jnp.concatenate(g, axis=1) for g in slab_groups]
        return cols[0] if ilp == 1 else jnp.concatenate(cols, axis=0)

    if cp_mode:
        # Adaptive CP-stream form (VERDICT r4 #2 experiment): p2_ref is a
        # cost-shaped block of CP = C + P2_eff for THIS direction, and
        # the recurrence uses the exact identity
        #   C + min(prev, m + P2, min(dn, up) + P1) - m
        #     == min(C + min(prev, min(dn, up) + P1) - m, CP)
        # so the per-step P2 operand is streamed data with full lane
        # shape — no [BR, 1] -> [BR, D] broadcast relayout inside the
        # latency chain.
        if not out_hwd or seg or in_hwd:
            raise NotImplementedError("cp_mode: unrolled whd form only")

        def upd_cp(prev, cpx, c):
            m = jnp.min(prev, axis=-1, keepdims=True)
            dn = jnp.concatenate([prev[..., :1], prev[..., :-1]], axis=-1)
            upv = jnp.concatenate([prev[..., 1:], prev[..., -1:]], axis=-1)
            t = jnp.minimum(prev, jnp.minimum(dn, upv) + p1)
            return jnp.minimum(c + (t - m), cpx)

        carries = [_rows(carry_ref[:].astype(ct), k) for k in range(ilp)]
        slabs = [[None] * xc for _ in range(ilp)]
        xs = range(xc - 1, -1, -1) if reverse else range(xc)
        for x in xs:
            gx = chunk * xc + x
            c = cost_ref[x].astype(ct)
            origin = (gx >= x_hi - 1) if reverse else (gx <= x_lo)
            cpx = p2_ref[x].astype(ct)
            for k in range(ilp):
                ck = _rows(c, k)
                l = jnp.where(
                    origin, ck, upd_cp(carries[k], _rows(cpx, k), ck)
                )
                slabs[k][x] = l.astype(dt)[:, None, :]
                carries[k] = l
        carry_ref[:] = (
            carries[0] if ilp == 1 else jnp.concatenate(carries, axis=0)
        ).astype(carry_ref.dtype)
        block = _assemble(slabs)
        if accumulate:
            out_ref[:] = acc_ref[:] + block
        else:
            out_ref[:] = block
        return

    if in_hwd and not out_hwd:
        raise NotImplementedError("in_hwd requires the unrolled out_hwd form")
    if out_hwd:
        if adaptive and not seg:
            # Unrolled steps take static lane slices of ONE whole-block
            # transpose instead of XC single-row relayouts. (Packed maps
            # are already lane-shaped; p2_at above loads them directly.)
            # The maps stay in the TRANSPOSED (wp, hp) layout even under
            # in_hwd: a 2-D (br, xc) map block violates Mosaic's
            # 128-divisible-minor rule when xc < 128, while (xc, br) is
            # always legal.
            p2t = jnp.transpose(p2_ref[:])             # [BR, XC]
            p2_at = lambda x: p2t[:, x:x + 1]
        carries = [_rows(carry_ref[:].astype(ct), k) for k in range(ilp)]
        slabs = [[None] * xc for _ in range(ilp)]
        xs = range(xc - 1, -1, -1) if reverse else range(xc)
        for x in xs:
            gx = chunk * xc + x
            c = (cost_ref[:, x, :] if in_hwd else cost_ref[x]).astype(ct)
            origin = (gx >= x_hi - 1) if reverse else (gx <= x_lo)
            for k in range(ilp):
                ck = _rows(c, k)
                p2x = p2_at(x)
                if adaptive and ilp > 1:
                    p2x = _rows(p2x, k)
                l = jnp.where(origin, ck, ck + upd(carries[k], p2x))
                slabs[k][x] = l.astype(dt)[:, None, :]  # [BRG, 1, D]
                carries[k] = renorm(l)
        carry_ref[:] = (
            carries[0] if ilp == 1 else jnp.concatenate(carries, axis=0)
        ).astype(carry_ref.dtype)
        block = _assemble(slabs)                       # [BR, XC, D]
        if accumulate:
            out_ref[:] = acc_ref[:] + block
        else:
            out_ref[:] = block
        return

    def body(i, carry):
        x = (xc - 1 - i) if reverse else i
        gx = chunk * xc + x
        c = cost_ref[x].astype(ct)
        origin = (gx >= x_hi - 1) if reverse else (gx <= x_lo)
        l = jnp.where(origin, c, c + upd(carry, p2_at(x)))
        if accumulate:
            out_ref[x] = acc_ref[x] + l.astype(dt)
        else:
            out_ref[x] = l.astype(dt)
        return renorm(l)

    final = jax.lax.fori_loop(0, xc, body, carry_ref[:].astype(ct))
    carry_ref[:] = final.astype(carry_ref.dtype)


def _v_kernel(*refs, p1, p2, diag, bh, up, adaptive=False, ct=jnp.int32,
              use_roll=False, seg=None):
    """T2B + down-right + down-left rows (or the three up paths) for one
    [BH, W, D] row block, accumulated onto acc_ref.

    Refs, in order: bounds (SMEM), cost block, [p2 maps block if adaptive],
    accumulator block, output block, three carry scratches.

    Fresh starts at the in-frame rectangle's edges (b_ref, see N_BOUNDS):
    rows <= y_lo going down / >= y_hi - 1 going up, and for the diagonal
    carries additionally columns <= x_lo / >= x_hi - 1.

    Adaptive P2: p2m_ref is a [BH, n_maps, W] block of the per-direction
    effective-P2 maps (vertical path first, then diagonal A / B when
    diag), row-interleaved so its block minors (n_maps, W) satisfy the
    (8, 128) rule for any BH; each row step slices a [1, W] row per path
    and transposes it to the [W, 1] sublane column the recurrence
    broadcasts over D.

    Lane packing (seg = r): for small disparity ranges the block is the
    PACKED volume [BH, W/G, G*r] with G = 128 // r adjacent x sharing the
    lane axis (lane = g*r + rd, x = xg*G + g). The scan axis (rows) is
    untouched, so origin masks are unchanged; the recurrence becomes the
    segmented _seg_upd and the diagonal one-pixel x shifts become a lane
    rotate by r with a sublane-boundary fix. Bit-identical to the
    unpacked kernel per segment."""
    it = iter(refs)
    b_ref, cost_ref = next(it), next(it)
    p2m_ref = next(it) if adaptive else None
    acc_ref, out_ref = next(it), next(it)
    vc_ref, d1c_ref, d2c_ref = next(it), next(it), next(it)
    pid = pl.program_id(0)
    nb = pl.num_programs(0)
    dt = out_ref.dtype
    w, d = vc_ref.shape
    block = (nb - 1 - pid) if up else pid
    y_lo, y_hi, x_lo, x_hi = b_ref[0], b_ref[1], b_ref[2], b_ref[3]

    if seg:
        g_lanes = d // seg
        sub = jax.lax.broadcasted_iota(jnp.int32, (w, d), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (w, d), 1)
        x_iota = sub * g_lanes + lane // seg
        upd = lambda prev, p2x: _seg_upd(prev, p1, p2x, seg)
        renorm = lambda l: _seg_renorm(l, seg)

        def shift_a(m):
            # predecessor x-1: lane rotate by -seg; the first group of
            # each sublane pulls from the previous sublane's last group.
            a = _rot(m, -seg)
            b = jnp.concatenate([a[:1], a[:-1]], axis=0)
            return jnp.where(lane < seg, b, a)

        def shift_b(m):
            # predecessor x+1: lane rotate by +seg; last group pulls from
            # the next sublane's first group.
            a = _rot(m, seg)
            b = jnp.concatenate([a[1:], a[-1:]], axis=0)
            return jnp.where(lane >= d - seg, b, a)
    else:
        x_iota = jax.lax.broadcasted_iota(jnp.int32, (w, d), 0)
        upd = lambda prev, p2x: _upd(prev, p1, p2x, use_roll)
        renorm = _renorm
        shift_a = lambda m: jnp.concatenate([m[:1], m[:-1]], axis=0)
        shift_b = lambda m: jnp.concatenate([m[1:], m[-1:]], axis=0)

    # Row-loop invariants, hoisted (the bound scalars come from SMEM so
    # these are not compile-time constants the way static extents were).
    diag_a_fresh = x_iota <= x_lo
    diag_b_fresh = x_iota >= x_hi - 1
    nm = 3 if diag else 1
    if adaptive and seg:
        # Packed maps (_pack_map_lanes): block is [BH, nm*WPK, DK] with the
        # per-lane effective P2 already in the consumer's packed layout —
        # per row each path is a static sublane slice, no relayout.
        wpk = w  # vc_ref is the PACKED carry: (wpk, dk)
        p_at = lambda r, path: p2m_ref[r, path * wpk:(path + 1) * wpk, :]
    elif adaptive:
        # ONE whole-block relayout per grid step; every per-row per-path
        # column is then a free static lane slice.
        pmt = jnp.transpose(p2m_ref[:].reshape(bh * nm, w))  # [W, BH*nm]
        p_at = lambda r, path: pmt[:, r * nm + path:r * nm + path + 1]
    v = vc_ref[:]
    d1 = d1c_ref[:] if diag else None
    d2 = d2c_ref[:] if diag else None
    rows = range(bh - 1, -1, -1) if up else range(bh)
    for r in rows:
        c = cost_ref[r].astype(ct)
        grow = block * bh + r
        origin = (grow >= y_hi - 1) if up else (grow <= y_lo)
        pv = p_at(r, 0) if adaptive else p2                    # [W, 1]
        lv = jnp.where(origin, c, c + upd(v, pv))
        acc = lv
        if diag:
            # diagonal A: predecessor one pixel to the LEFT in the previous
            # scan row (down-right going down, up-right going up); fresh
            # start at the frame's left edge.
            pa = p_at(r, 1) if adaptive else p2
            l1 = jnp.where(
                jnp.logical_or(origin, diag_a_fresh),
                c, c + upd(shift_a(d1), pa),
            )
            # diagonal B: predecessor one pixel to the RIGHT; fresh start
            # at the frame's right edge.
            pb = p_at(r, 2) if adaptive else p2
            l2 = jnp.where(
                jnp.logical_or(origin, diag_b_fresh),
                c, c + upd(shift_b(d2), pb),
            )
            acc = acc + l1 + l2
            d1, d2 = renorm(l1), renorm(l2)
        out_ref[r] = acc_ref[r] + acc.astype(dt)
        v = renorm(lv)
    vc_ref[:] = v
    if diag:
        d1c_ref[:] = d1
        d2c_ref[:] = d2


def sgm_aggregate_pallas(
    cost: jnp.ndarray,
    cfg: StereoConfig,
    interpret: bool = False,
    _passes: str = "hv",
    compute_dtype=jnp.float32,
    use_roll: bool = False,
    bounds: jnp.ndarray = None,
    acc_dtype=None,
    image: jnp.ndarray = None,
) -> jnp.ndarray:
    """S(p, d) = sum of 4/8 SGM path costs over four blocked HBM passes.

    Args:
      cost: [H, W, D] integer cost volume (int8 where the unary bound
        allows — census/rank — else int16).
      cfg: static config; num_paths in {4, 8}.
      bounds: optional int32[N_BOUNDS] in-frame rectangle (frame_bounds());
        carries fresh-start at its edges instead of the block edges —
        bit-exact inside the rectangle vs the golden sgm_aggregate with
        the matching rectangular valid mask. None = whole block valid.
      acc_dtype: dtype of the path accumulator S (default: cost.dtype).
        Must hold num_paths * (max_unary_cost + P2); int16 for 8 paths.
      image: [H, W] reference-view intensities; required when
        cfg.adaptive_p2 (per-direction effective-P2 maps, _adaptive_maps).

    Returns: [H, W, D] summed volume in acc_dtype, bit-exact vs the golden
    sgm_aggregate for full-frame (all-valid) inputs.
    """
    if cfg.num_paths == 0:
        return cost
    adaptive = bool(cfg.adaptive_p2)
    h, w, d = cost.shape
    if bounds is None:
        bounds = frame_bounds(h, w)
    ct = compute_dtype
    if ct == jnp.float32:
        p1, p2 = float(cfg.p1), float(cfg.p2)
    else:
        p1, p2 = int(cfg.p1), int(cfg.p2)
    diag = cfg.num_paths == 8
    dt = jnp.dtype(acc_dtype) if acc_dtype is not None else cost.dtype
    if acc_dtype is None and dt.itemsize == 1:
        # An int8 path accumulator silently wraps (8-path census sums reach
        # ~1464); widen the default so narrow cost volumes stay exact.
        dt = jnp.dtype(jnp.int16)

    # Pad H to the horizontal row-block multiple and W to the x-chunk
    # multiple. Horizontal scans never cross rows, and the vertical/
    # diagonal origin masks use true_h/true_w, so padding is pure garbage
    # that gets cropped.
    br, hp, xc, wp = plan_dims(h, w, d)
    if (hp, wp) != (h, w):
        cost = jnp.pad(cost, ((0, hp - h), (0, wp - w), (0, 0)))
    grid_h = (hp // br, wp // xc)
    if adaptive:
        p2h_f, p2h_r, p2v_dn, p2v_up = _adaptive_maps(
            image, cfg, h, w, hp, wp, ct
        )
    # Lane packing for small disparity ranges (the pyramid model's
    # residual volumes, SURVEY.md §7): a [.., D] slab with D < 128 leaves
    # 1 - D/128 of every VPU tile idle, so pack G = 128 // D adjacent x
    # positions (vertical passes) or scanlines (horizontal passes) into
    # the lane axis and run the segmented recurrence (_seg_upd) — the
    # instruction count drops ~G-fold while staying bit-identical
    # (measured 2.1x on the vertical family at 375x1242x16). The
    # horizontal family only packs when the whole padded frame still
    # gives >= 32-sublane slabs (rows are its parallel axis; skinnier
    # packed slabs went LATENCY-bound and lost to the unpacked layout),
    # and then uses ONE whole-frame row block.
    seg = None
    G = 1
    if (_PACK_SMALL_D
            and d < 128 and 128 % d == 0 and d & (d - 1) == 0
            and wp % (8 * (128 // d)) == 0):
        seg = d
        G = 128 // d
    seg_h = seg if (seg and hp % (8 * G) == 0 and hp // G >= 32) else None
    br_h = hp if seg_h else br
    dk = d * G
    brk = (hp // G) if seg_h else br
    hpk = (hp // G) if seg_h else hp
    wpk = wp // G
    grid_h = (hp // br_h, wp // xc)
    dk_h = dk if seg_h else d
    if adaptive and seg:
        # Packed-lane map layout for the segmented recurrence (see
        # _pack_map_lanes): same element count as the unpacked maps, and
        # the kernels read them with zero relayout ops.
        nm_ = 3 if diag else 1
        p2v_dn = _pack_map_lanes(p2v_dn, G, seg).reshape(hp, nm_ * wpk, dk)
        p2v_up = _pack_map_lanes(p2v_up, G, seg).reshape(hp, nm_ * wpk, dk)
    if adaptive and seg_h:
        p2h_f = _pack_map_lanes(p2h_f, G, seg)     # (wp, hpk, dk)
        p2h_r = _pack_map_lanes(p2h_r, G, seg)
    # The unrolled no-transpose output assembles [BR, XC, D] blocks by
    # middle-dim concatenation, which Mosaic only lowers when D fills the
    # 128-lane register; smaller D emits in the scan (W, H, D) layout via
    # leading-dim stores and transposes once in XLA between pass families.
    hwd = dk_h >= 128

    def h_call(reverse, acc, cost_whd, cp=None):
        accumulate = acc is not None
        # Input blocks are [XC, BR, D] slices of the transposed (W, H, D)
        # volume (the scan axis must be untiled); OUTPUT blocks are
        # [BR, XC, D] slices of the (H, W, D) accumulator — the unrolled
        # kernel assembles them directly, so no transpose sits between the
        # horizontal and vertical pass families (d >= 128 only, see above).
        im_in = (
            (lambda i, j: (grid_h[1] - 1 - j, i, 0))
            if reverse
            else (lambda i, j: (j, i, 0))
        )
        im_out = (
            (lambda i, j: (i, grid_h[1] - 1 - j, 0))
            if reverse
            else (lambda i, j: (i, j, 0))
        ) if hwd else im_in
        out_block = (brk, xc, dk_h) if hwd else (xc, brk, dk_h)
        out_extent = (hpk, wp, dk_h) if hwd else (wp, hpk, dk_h)
        im_2d = (
            (lambda i, j: (grid_h[1] - 1 - j, i))
            if reverse
            else (lambda i, j: (j, i))
        )
        in_specs = [
            _SMEM_SPEC,
            pl.BlockSpec((xc, brk, dk_h), im_in, memory_space=pltpu.VMEM),
        ]
        args = [bounds, cost_whd]
        if adaptive:
            if cp is not None:
                # CP-stream experiment: the map slot carries a cost-shaped
                # CP = C + P2_eff block for this direction (_h_kernel
                # cp_mode).
                in_specs.append(
                    pl.BlockSpec((xc, brk, dk_h), im_in,
                                 memory_space=pltpu.VMEM)
                )
                args.append(cp)
            else:
                in_specs.append(
                    pl.BlockSpec((xc, brk, dk_h), im_in,
                                 memory_space=pltpu.VMEM)
                    if seg_h
                    else pl.BlockSpec((xc, br), im_2d,
                                      memory_space=pltpu.VMEM)
                )
                args.append(p2h_r if reverse else p2h_f)
        if accumulate:
            in_specs.append(
                pl.BlockSpec(out_block, im_out, memory_space=pltpu.VMEM)
            )
            args.append(acc)
        # _H_ILP row-group split: unrolled whd form only, each group an
        # 8-aligned sublane slice (seg packs the whole frame into one
        # block and is already relayout-free — left at one chain).
        ilp = _H_ILP if (hwd and not seg_h and _H_ILP > 1
                         and brk % (8 * _H_ILP) == 0) else 1
        body = functools.partial(
            _h_kernel, p1=p1, p2=p2, xc=xc,
            reverse=reverse, accumulate=accumulate, adaptive=adaptive,
            ct=ct, use_roll=use_roll, out_hwd=hwd, seg=seg_h,
            cp_mode=cp is not None, ilp=ilp,
        )
        alias = {len(args) - 1: 0} if accumulate else {}
        return pl.pallas_call(
            body,
            grid=grid_h,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(out_block, im_out,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_extent, dt),
            scratch_shapes=[pltpu.VMEM((brk, dk_h), ct)],
            input_output_aliases=alias,
            compiler_params=_VMEM_PARAMS,
            interpret=interpret,
        )(*args)

    def v_call(up, acc):
        bh = _v_block_rows(hp, wpk, dk, dt.itemsize)
        nb = hp // bh
        im = (lambda i: (nb - 1 - i, 0, 0)) if up else (lambda i: (i, 0, 0))
        carry = lambda: pltpu.VMEM((wpk, dk), ct)
        in_specs = [
            _SMEM_SPEC,
            pl.BlockSpec((bh, wpk, dk), im, memory_space=pltpu.VMEM),
        ]
        args = [bounds, cost_v]
        if adaptive:
            nm = 3 if diag else 1
            in_specs.append(
                pl.BlockSpec((bh, nm * wpk, dk), im, memory_space=pltpu.VMEM)
                if seg
                else pl.BlockSpec((bh, nm, wp), im, memory_space=pltpu.VMEM)
            )
            args.append(p2v_up if up else p2v_dn)
        in_specs.append(pl.BlockSpec((bh, wpk, dk), im,
                                     memory_space=pltpu.VMEM))
        args.append(acc)
        return pl.pallas_call(
            functools.partial(
                _v_kernel, p1=p1, p2=p2, diag=diag, bh=bh, up=up,
                adaptive=adaptive, ct=ct, use_roll=use_roll, seg=seg,
            ),
            grid=(nb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bh, wpk, dk), im,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((hp, wpk, dk), dt),
            scratch_shapes=[carry(), carry(), carry()],
            input_output_aliases={len(args) - 1: 0},
            compiler_params=_VMEM_PARAMS,
            interpret=interpret,
        )(*args)

    # _passes is a profiling knob ("h" / "v" / "hv"); results are only
    # meaningful SGM sums for the default "hv".
    if "h" in _passes:
        cost_whd = jnp.transpose(cost, (1, 0, 2))
        if seg_h:
            cost_whd = cost_whd.reshape(wp, hpk, dk)   # pack G rows/lane
        cp_f = cp_r = None
        if adaptive and _ADAPTIVE_CP_H and hwd and not seg_h:
            # CP = C + P2_eff per direction, int16 (<= maxc + P2 < 2^15),
            # built by one fused XLA sweep each over the whd layout.
            cp_f = cost_whd.astype(jnp.int16) + p2h_f[
                :, :, None
            ].astype(jnp.int16)
            cp_r = cost_whd.astype(jnp.int16) + p2h_r[
                :, :, None
            ].astype(jnp.int16)
        s = h_call(False, None, cost_whd, cp=cp_f)
        s = h_call(True, s, cost_whd, cp=cp_r)
        if not hwd:
            s = jnp.transpose(s, (1, 0, 2))
        if seg_h:
            # unpack the row-packed accumulator back to (H, W, D)
            s = (
                s.reshape(hpk, wp, G, d)
                .transpose(0, 2, 1, 3)
                .reshape(hp, wp, d)
            )
    else:
        s = cost.astype(dt)  # v-only profiling: alias dtype must match out
    if "v" in _passes:
        cost_v = cost.reshape(hp, wpk, dk) if seg else cost  # pack G x/lane
        s = s.reshape(hp, wpk, dk) if seg else s
        s = v_call(False, s)
        s = v_call(True, s)
        if seg:
            s = s.reshape(hp, wp, d)
    return s[:h, :w]


def _epilogue_shift(mat, base_shift, wp, interpret, sign=1):
    """out[x, d] = mat[(x - base_shift - sign * d) mod wp, d].

    Compiled path: the per-lane sublane shift decomposes into log2(D)
    STATIC sublane rotates gated by the lane index bits (Mosaic supports
    neither strided rotates over the minor axis nor gathers). Interpret
    mode uses a take_along_axis gather (CPU tests only).
    """
    d = mat.shape[1]
    if interpret:
        x = jax.lax.broadcasted_iota(jnp.int32, (wp, d), 0)
        l = jax.lax.broadcasted_iota(jnp.int32, (wp, d), 1)
        idx = (x - base_shift - sign * l) % wp
        return jnp.take_along_axis(mat, idx, axis=0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (wp, d), 1)
    base = base_shift % wp
    if base:
        # constant part: out[x] = mat[x - base_shift]
        mat = jnp.concatenate([mat[-base:], mat[:-base]], axis=0)
    k = 0
    while (1 << k) < d:
        sh = 1 << k
        if sign > 0:
            rolled = jnp.concatenate([mat[-sh:], mat[:-sh]], axis=0)
        else:
            rolled = jnp.concatenate([mat[sh:], mat[:sh]], axis=0)
        mat = jnp.where((lane & sh) != 0, rolled, mat)
        k += 1
    return mat


def _v_fused_kernel(*refs, p1, p2, diag, bh, ct, use_roll, cfg,
                    interpret, image_width, adaptive=False, emit_d0=False,
                    emit_qr=False, qr_src=None):
    """Bottom-up vertical pass + FULL selection epilogue, never writing S.

    Per row, after summing the up paths onto the forward accumulator:
    WTA argmin, parabola subpixel, uniqueness gate, and the right-view WTA
    via a strided-roll anti-diagonal restack (S_R(x,d) = S(x+d,d)) — all
    lane reductions and rolls, no gathers. Reduction results are naturally
    [W, 1] columns; the block's columns are collected and transposed once
    into row-major [BH, W] output tiles.

    Cost/argmin pairs ride ONE packed f32 value q = s * D + lane (exact:
    8-path sums stay below 2^15, so q < 2^24): its lane-min IS the
    first-winner argmin (ties break to the smaller lane), halving the WTA
    reductions, and the SAME packed matrix feeds the anti-diagonal shift
    pyramid so the right-view min and argmin come out of one reduction.
    The integer LR compare also runs IN-KERNEL: a second shift pyramid
    restacks the right-winner column as R2[x, l] = d_r[x - l - md], and
    the lane select at l == d0 reads d_R at the left winner's
    correspondence — the earlier design exported packed (d_r, d0) maps and
    compared in XLA via a one-hot select over D shifted copies, whose two
    [H, W, D] sweeps cost ~3 ms/frame at KITTI scale (the dominant
    pipeline overhead once aggregation was tuned).

    ``emit_qr`` (parallel/bands.py LR stitching, VERDICT r2 #7): two extra
    outputs emit the PACKED right-view partial min m_r = min_d over
    IN-PATCH anti-diagonals of S(x+d, d)*PD + d (lanes whose source column
    exceeds the patch's true extent are masked BIG, so m_r is a true
    partial a neighbouring patch's m_r can be min-combined with in XLA),
    plus the LEFT-SPILL [BH, SP] — the same partial mins at block-local
    positions [-SP, 0), this block's contribution to the PREVIOUS patch's
    map. The spill is free of a second shift pyramid: the mod-W wraps of
    the one existing anti-diagonal restack land q[x + d - W] (sources in
    [0, D)) exactly on rows [W - SP, W), so one extra mask + lane-min per
    row recovers them. The valid output then packs the gates separately —
    valid = ok_nolr + 2*ok_lr + 4*d0 — because the stitcher must replace
    the (edge-truncated) in-kernel LR verdict in boundary strips while
    keeping the uniqueness gate.

    Refs, in order: bounds (SMEM), cost block, [p2 maps block if adaptive
    — [BH, n_maps, W] per-direction effective-P2, see _v_kernel], forward
    accumulator block, disp/valid[/qr/spill] outputs, three carry
    scratches.
    """
    it = iter(refs)
    b_ref, cost_ref = next(it), next(it)
    p2m_ref = next(it) if adaptive else None
    acc_ref, disp_ref, valid_ref = next(it), next(it), next(it)
    qr_ref = next(it) if emit_qr else None
    spill_ref = next(it) if emit_qr else None
    vc_ref, d1c_ref, d2c_ref = next(it), next(it), next(it)
    pid = pl.program_id(0)
    nb = pl.num_programs(0)
    w, d = vc_ref.shape
    block = nb - 1 - pid
    y_hi, x_lo, x_hi = b_ref[1], b_ref[2], b_ref[3]
    x0 = b_ref[4]

    BIG = jnp.float32(3e38)
    md = int(cfg.min_disparity)
    x_iota = jax.lax.broadcasted_iota(jnp.int32, (w, d), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (w, d), 1)
    # Row-loop invariants, hoisted (the frame-bound scalars come from SMEM
    # so these are not compile-time constants the way static extents were).
    diag_a_fresh = x_iota <= x_lo
    diag_b_fresh = x_iota >= x_hi - 1
    oof_right = x0 + x_iota + lane + md >= image_width
    # Packing radix: the smallest power of two >= D, so pack/unpack are
    # exact float ops (s * pd + lane < 2^15 * 2^9 <= 2^24).
    pd = 1 << max(0, (d - 1).bit_length())
    pdf = jnp.float32(pd)
    inv_pd = jnp.float32(1.0 / pd)

    nm = 3 if diag else 1
    if adaptive:
        # See _v_kernel: one whole-block relayout, free per-row slices.
        pmt = jnp.transpose(p2m_ref[:].reshape(bh * nm, w))  # [W, BH*nm]
    v = vc_ref[:]
    d1 = d1c_ref[:] if diag else None
    d2 = d2c_ref[:] if diag else None
    disp_cols = [None] * bh
    valid_cols = [None] * bh
    qr_cols = [None] * bh
    df = jnp.float32(d)
    lane_f = lane.astype(jnp.float32)
    if cfg.lr_check:
        # Hoisted LR invariants: local x column and the global in-frame
        # test of the correspondence x - d_L - md (cheap [W, 1] math).
        x_col = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    if emit_qr:
        # Source columns are restricted to the patch's OWNED range
        # (qr_src, static block-local): every frame column is counted by
        # exactly ONE patch — the one where its census window is complete
        # and its S is halo-warmed — so min-combining partials across
        # patches reconstructs the frame map without letting a patch's
        # edge-clamped cost fringe (census windows read off-block zeros —
        # arbitrarily small fake costs) win the min. Also kills padding/
        # wrap garbage (own_hi <= true extent).
        own_lo, own_hi = qr_src if qr_src is not None else (0, None)
        src = x_iota + lane + md
        trunc_r = (src < own_lo) | (
            src >= own_hi if own_hi is not None else src >= x_hi
        )
        sp_w = max(128, -(-(d + md) // 128) * 128)  # == spill_width(d, md)
        spill_cols = [None] * bh
        # Left-spill keep mask: exactly the wrapped entries of the shift
        # pyramid (source column s = x + lane + md - W), same owned-range
        # global-frame restrictions as the main map's unwrapped sources.
        # Only rows [W - k, W) can wrap (lane < D), so the mask and the
        # per-row lane-min below run on that slice, not the full [W, D]
        # matrix (~W/SP x less spill work on wide blocks).
        k_sp = min(w, sp_w)
        src_s = src[w - k_sp:]
        sw = src_s - w
        wrap_keep = (
            (src_s >= w)
            & (sw >= own_lo)
            & (sw < own_hi if own_hi is not None else sw < x_hi)
            & (x0 + sw < image_width)
        )
    for r in range(bh - 1, -1, -1):
        c = cost_ref[r].astype(ct)
        grow = block * bh + r
        origin = grow >= y_hi - 1
        pv = pmt[:, r * nm:r * nm + 1] if adaptive else p2     # [W, 1]
        lv = jnp.where(origin, c, c + _upd(v, p1, pv, use_roll))
        acc = lv
        if diag:
            pa = pmt[:, r * nm + 1:r * nm + 2] if adaptive else p2
            d1_sh = jnp.concatenate([d1[:1], d1[:-1]], axis=0)
            l1 = jnp.where(
                jnp.logical_or(origin, diag_a_fresh),
                c, c + _upd(d1_sh, p1, pa, use_roll),
            )
            pb = pmt[:, r * nm + 2:r * nm + 3] if adaptive else p2
            d2_sh = jnp.concatenate([d2[1:], d2[-1:]], axis=0)
            l2 = jnp.where(
                jnp.logical_or(origin, diag_b_fresh),
                c, c + _upd(d2_sh, p1, pb, use_roll),
            )
            acc = acc + l1 + l2
            d1, d2 = _renorm(l1), _renorm(l2)
        v = _renorm(lv)

        s_row = acc_ref[r].astype(jnp.float32) + acc.astype(jnp.float32)

        # --- WTA: ONE packed lane reduction gives (cost, first-argmin);
        # ties break to the smaller lane exactly like the golden masked
        # iota reduction. All values integer-exact in f32. ---
        q = s_row * pdf + lane_f
        q0 = jnp.min(q, axis=1, keepdims=True)                     # [W,1]
        c0 = jnp.floor(q0 * inv_pd)
        d0 = q0 - c0 * pdf                                         # [W,1]
        ok = jnp.ones((w, 1), dtype=jnp.int32)
        if cfg.uniqueness_ratio > 0:
            near = jnp.abs(lane_f - d0) <= 1.0
            c2 = jnp.min(jnp.where(near, BIG, s_row), axis=1, keepdims=True)
            ok = ok * (c2 > c0 * (1.0 + cfg.uniqueness_ratio)).astype(
                jnp.int32
            )
        disp_row = d0
        if cfg.subpixel and d > 1:
            cm = jnp.min(
                jnp.where(lane_f == d0 - 1.0, s_row, BIG),
                axis=1, keepdims=True,
            )
            cp = jnp.min(
                jnp.where(lane_f == d0 + 1.0, s_row, BIG),
                axis=1, keepdims=True,
            )
            denom = cp + cm - 2.0 * c0
            offset = jnp.where(
                denom > 0, (cm - cp) / (2.0 * jnp.maximum(denom, 1.0)), 0.0
            )
            offset = jnp.clip(offset, -0.5, 0.5)
            interior = (d0 > 0) & (d0 < df - 1)
            disp_row = disp_row + jnp.where(interior, offset, 0.0)
        disp_row = disp_row + jnp.float32(md)

        if cfg.lr_check:
            # Right-view (min, argmin) from ONE anti-diagonal restack of
            # the SAME packed matrix: Q_R(x, d) = S(x+d, d)*PD + d, so one
            # lane-min unpacks to the right-view winner with golden
            # first-min ties. Samples beyond the GLOBAL frame are masked
            # huge (x0: block's global x origin); rows with every lane
            # masked take winner 0, matching the golden argmin-over-big.
            q_rr = _epilogue_shift(q, -md, w, interpret, sign=-1)
            q_r = jnp.where(oof_right, BIG, q_rr)
            if emit_qr:
                q_r = jnp.where(trunc_r, BIG, q_r)
            m_r = jnp.min(q_r, axis=1, keepdims=True)              # [W,1]
            d_r = m_r - jnp.floor(m_r * inv_pd) * pdf
            d_r = jnp.where(m_r < BIG, d_r, 0.0)
            # d_R at the left winner's correspondence x - d0 - md, via a
            # second pyramid R2[x, l] = d_r[x - l - md] and the lane
            # select at l == d0. Wrapped (mod W) samples only occur where
            # the correspondence is globally out of frame, which in_frame
            # masks — matching the golden lr_consistency clamp semantics
            # everywhere the value survives.
            r2 = _epilogue_shift(
                jnp.broadcast_to(d_r, (w, d)), md, w, interpret, sign=1
            )
            d_r_at = jnp.min(
                jnp.where(lane_f == d0, r2, BIG), axis=1, keepdims=True
            )
            xr_g = x0 + x_col - d0.astype(jnp.int32) - md
            in_frame = (xr_g >= 0) & (xr_g < image_width)
            lr_bit = ((jnp.abs(d0 - d_r_at) <= jnp.float32(cfg.lr_tau))
                      & in_frame).astype(jnp.int32)
            if not emit_qr:
                ok = ok * lr_bit

        disp_cols[r] = disp_row
        if emit_qr:
            # Separate gate bits + integer winner (see docstring): the
            # stitcher recombines ok_nolr with a cross-patch LR verdict in
            # boundary strips and with lr_bit elsewhere.
            valid_cols[r] = ok + 2 * lr_bit + 4 * d0.astype(jnp.int32)
            qr_cols[r] = m_r
            spc = jnp.min(
                jnp.where(wrap_keep, q_rr[w - k_sp:], BIG),
                axis=1, keepdims=True,
            )
            # Blocks narrower than SP emit BIG for positions < -W (no
            # in-block source can reach them; golden twin agrees).
            if k_sp < sp_w:
                spc = jnp.concatenate(
                    [jnp.full((sp_w - k_sp, 1), BIG, jnp.float32), spc],
                    axis=0,
                )
            spill_cols[r] = spc
        elif emit_d0:
            # Pack the INTEGER winner beside the gate: valid = ok + 2*d0.
            # The exact-LR fast path (pipeline.py) needs integer winners
            # for the consistency compare (LR precedes subpixel), and the
            # subpixel disp cannot be rounded back bit-exactly (parabola
            # offsets hit exactly +-0.5 on neighbor-cost ties). d0 < 2^9,
            # so the pack rides the existing int32 output for free.
            valid_cols[r] = ok + 2 * d0.astype(jnp.int32)
        else:
            valid_cols[r] = ok
    vc_ref[:] = v
    if diag:
        d1c_ref[:] = d1
        d2c_ref[:] = d2
    # Collected [W, 1] reduction columns -> one [BH, W] row-major block
    # (output blocks must keep >=8x128-tileable trailing dims).
    disp_ref[:] = jnp.concatenate(disp_cols, axis=1).T
    valid_ref[:] = jnp.concatenate(valid_cols, axis=1).T
    if emit_qr:
        qr_ref[:] = jnp.concatenate(qr_cols, axis=1).T
        spill_ref[:] = jnp.concatenate(spill_cols, axis=1).T


def sgm_wta_fused_pallas(
    cost: jnp.ndarray,
    cfg: StereoConfig,
    interpret: bool = False,
    compute_dtype=jnp.float32,
    cost_whd=None,
    true_shape=None,
    x_offset: int = 0,
    bounds: jnp.ndarray = None,
    image_width: int = None,
    acc_dtype=None,
    image: jnp.ndarray = None,
    emit_d0: bool = False,
    emit_qr: bool = False,
    qr_src=None,
    h_from_hwd: bool = False,
    _expose_stages: dict = None,
):
    """SGM + WTA + subpixel + uniqueness + LR-check, S never materialized
    in its final form.

    ``h_from_hwd`` (d >= 128 only): the horizontal passes read the
    (H, W, D) volume directly via static sublane slices of [BR, XC, D]
    blocks instead of the transposed (W, H, D) copy — callers then skip
    the cost kernel's transposed emission entirely (``cost_whd`` must be
    None; a measured 0.445 ms/frame of dual-layout write at KITTI scale).

    ``emit_d0``: the int32 valid output packs the integer winner beside
    the gate (valid = ok + 2*d0, d0 EXCLUDING min_disparity) and is
    returned raw instead of cast to bool — the exact-LR fast path unpacks
    it (pipeline.py).

    ``emit_qr`` (requires cfg.lr_check): returns third and fourth float32
    outputs — the packed right-view PARTIAL min m_r ([H, W]) and its
    left-spill ([H, SP], SP = max(PD, 128), column j = the partial min at
    block-local position j - SP; see _v_fused_kernel) for cross-patch LR
    stitching (parallel/bands.py) — and the valid output packs
    valid = ok_nolr + 2*ok_lr + 4*d0 raw. ``qr_src`` (static block-local
    (lo, hi), default the whole true extent) masks which source columns
    the partials may draw from — the stitcher passes the patch's OWNED
    column range so every frame column is counted by exactly one patch
    (see _v_fused_kernel).

    ``image`` ([H, W] reference-view intensities, true shape) is required
    when cfg.adaptive_p2 — the per-direction effective-P2 maps ride into
    every pass (see _adaptive_maps).

    Runs the two horizontal passes and the downward vertical pass exactly
    like sgm_aggregate_pallas, then the fused bottom-up kernel emits
    (disp, valid) directly — removing the separate WTA sweep, the
    right-view re-index pass, AND the final 119 MB S write.

    ``bounds`` (frame_bounds()) marks the in-frame rectangle of a tile of
    a larger frame — carries fresh-start at frame edges and the LR framing
    uses the tile's global x origin; ``image_width`` is the STATIC global
    frame width (defaults to this block's width). Offsets inside bounds
    may be traced (shard_map tile origins).

    Returns (disp [H, W] float32, valid [H, W] bool), matching the golden
    wta + integer-LR postprocess pipeline bit-exactly — on tiles, inside
    the in-frame rectangle up to the halo-warm-up approximation the caller
    chose (parallel/tiling.py measures it).
    """
    if cfg.num_paths == 0:
        raise NotImplementedError("fused path requires SGM (num_paths > 0)")
    if emit_qr and not cfg.lr_check:
        raise ValueError("emit_qr requires cfg.lr_check")
    adaptive = bool(cfg.adaptive_p2)
    h, w = true_shape if true_shape is not None else cost.shape[:2]
    d = cost.shape[2]
    if image_width is None:
        # x_offset-only callers (parallel/bands.py column patches) are
        # fully in-frame: the frame extends at least to the patch's end.
        image_width = x_offset + w
    if bounds is None:
        bounds = frame_bounds(h, w, x_offset=x_offset, image_width=image_width)
    ct = compute_dtype
    use_roll = False
    if ct == jnp.float32:
        p1, p2 = float(cfg.p1), float(cfg.p2)
    else:
        p1, p2 = int(cfg.p1), int(cfg.p2)
    diag = cfg.num_paths == 8
    # Accumulator dtype (default: the cost's own, widened to int16 for
    # byte-wide volumes — path sums overflow int8). The cost volume itself
    # may be narrower (int8 census/rank) — the kernels read it through
    # .astype(ct), so only S traffic pays the accumulator width.
    dt = jnp.dtype(acc_dtype) if acc_dtype is not None else cost.dtype
    if acc_dtype is None and dt.itemsize == 1:
        dt = jnp.dtype(jnp.int16)

    br, hp, xc, wp = plan_dims(h, w, d)
    mdi = int(cfg.min_disparity)
    sp_w = max(128, -(-(d + mdi) // 128) * 128)  # spill_width(d, md)
    # One mod-W wrap of the shift pyramid covers spill positions down to
    # -wp; only positions >= -(D + md - 1) can have in-block sources, so
    # wp >= d + md suffices (stitch callers guard patch widths).
    if emit_qr and wp < d + mdi:
        raise ValueError(
            f"emit_qr requires block width >= D + min_disparity "
            f"({d + mdi}), got padded {wp}"
        )
    if cost.shape[:2] == (h, w) and (hp, wp) != (h, w):
        cost = jnp.pad(cost, ((0, hp - h), (0, wp - w), (0, 0)))
    if cost.shape[:2] != (hp, wp):
        raise ValueError(
            f"cost shape {cost.shape} matches neither true {(h, w)} nor "
            f"padded {(hp, wp)} extents"
        )
    grid_h = (hp // br, wp // xc)
    # See sgm_aggregate_pallas: the no-transpose [BR, XC, D] assembly needs
    # a full 128-lane D; smaller D emits (W, H, D) and transposes in XLA.
    hwd = d >= 128
    if h_from_hwd and not hwd:
        raise ValueError("h_from_hwd requires num_disparities >= 128")
    if h_from_hwd and cost_whd is not None:
        raise ValueError("h_from_hwd consumes the (H, W, D) volume only")
    if adaptive:
        p2h_f, p2h_r, p2v_dn, p2v_up = _adaptive_maps(
            image, cfg, h, w, hp, wp, ct
        )

    def h_call(reverse, acc, cost_whd, cp=None):
        accumulate = acc is not None
        # Input blocks are [XC, BR, D] slices of the transposed (W, H, D)
        # volume (the scan axis must be untiled); OUTPUT blocks are
        # [BR, XC, D] slices of the (H, W, D) accumulator — the unrolled
        # kernel assembles them directly, so no transpose sits between the
        # horizontal and vertical pass families (d >= 128 only, see above).
        # With h_from_hwd the INPUT is the (H, W, D) volume too (static
        # sublane slices in the unrolled kernel) and cost_whd never exists.
        im_in = (
            (lambda i, j: (grid_h[1] - 1 - j, i, 0))
            if reverse
            else (lambda i, j: (j, i, 0))
        )
        im_out = (
            (lambda i, j: (i, grid_h[1] - 1 - j, 0))
            if reverse
            else (lambda i, j: (i, j, 0))
        ) if hwd else im_in
        out_block = (br, xc, d) if hwd else (xc, br, d)
        out_extent = (hp, wp, d) if hwd else (wp, hp, d)
        im_2d = (
            (lambda i, j: (grid_h[1] - 1 - j, i))
            if reverse
            else (lambda i, j: (j, i))
        )
        if h_from_hwd:
            cost_in_spec = pl.BlockSpec((br, xc, d), im_out,
                                        memory_space=pltpu.VMEM)
            cost_in = cost
        else:
            cost_in_spec = pl.BlockSpec((xc, br, d), im_in,
                                        memory_space=pltpu.VMEM)
            cost_in = cost_whd
        # Adaptive maps keep the transposed (wp, hp) layout in BOTH
        # forms (see _h_kernel: (br, xc) 2-D blocks are illegal for
        # xc < 128).
        map_spec = pl.BlockSpec((xc, br), im_2d, memory_space=pltpu.VMEM)
        in_specs = [_SMEM_SPEC, cost_in_spec]
        args = [bounds, cost_in]
        if adaptive:
            if cp is not None:
                # CP-stream form (VERDICT r4 #2): the map slot carries a
                # cost-shaped CP = C + P2_eff block for this direction.
                in_specs.append(
                    pl.BlockSpec((xc, br, d), im_in,
                                 memory_space=pltpu.VMEM)
                )
                args.append(cp)
            else:
                in_specs.append(map_spec)
                args.append(p2h_r if reverse else p2h_f)
        if accumulate:
            in_specs.append(
                pl.BlockSpec(out_block, im_out, memory_space=pltpu.VMEM)
            )
            args.append(acc)
        # _H_ILP row-group split (see sgm_aggregate_pallas.h_call).
        ilp = _H_ILP if (hwd and _H_ILP > 1
                         and br % (8 * _H_ILP) == 0) else 1
        body = functools.partial(
            _h_kernel, p1=p1, p2=p2, xc=xc,
            reverse=reverse, accumulate=accumulate, adaptive=adaptive,
            ct=ct, use_roll=use_roll, out_hwd=hwd, in_hwd=h_from_hwd,
            cp_mode=cp is not None, ilp=ilp,
        )
        alias = {len(args) - 1: 0} if accumulate else {}
        return pl.pallas_call(
            body,
            grid=grid_h,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(out_block, im_out,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_extent, dt),
            scratch_shapes=[pltpu.VMEM((br, d), ct)],
            input_output_aliases=alias,
            compiler_params=_VMEM_PARAMS,
            interpret=interpret,
        )(*args)

    bh = _v_block_rows(hp, wp, d, dt.itemsize)
    nb = hp // bh
    nm = 3 if diag else 1

    def v_down(acc):
        im = lambda i: (i, 0, 0)
        carry = lambda: pltpu.VMEM((wp, d), ct)
        in_specs = [
            _SMEM_SPEC,
            pl.BlockSpec((bh, wp, d), im, memory_space=pltpu.VMEM),
        ]
        args = [bounds, cost]
        if adaptive:
            in_specs.append(
                pl.BlockSpec((bh, nm, wp), im, memory_space=pltpu.VMEM)
            )
            args.append(p2v_dn)
        in_specs.append(pl.BlockSpec((bh, wp, d), im,
                                     memory_space=pltpu.VMEM))
        args.append(acc)
        return pl.pallas_call(
            functools.partial(
                _v_kernel, p1=p1, p2=p2, diag=diag, bh=bh, up=False,
                adaptive=adaptive, ct=ct, use_roll=use_roll,
            ),
            grid=(nb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bh, wp, d), im, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((hp, wp, d), dt),
            scratch_shapes=[carry(), carry(), carry()],
            input_output_aliases={len(args) - 1: 0},
            compiler_params=_VMEM_PARAMS,
            interpret=interpret,
        )(*args)

    def v_up_fused(acc):
        bhf = _fused_block_rows(hp, wp, d, dt.itemsize)
        nbf = hp // bhf
        im3 = lambda i: (nbf - 1 - i, 0, 0)
        im2 = lambda i: (nbf - 1 - i, 0)
        carry = lambda: pltpu.VMEM((wp, d), ct)
        in_specs = [
            _SMEM_SPEC,
            pl.BlockSpec((bhf, wp, d), im3, memory_space=pltpu.VMEM),
        ]
        args = [bounds, cost]
        if adaptive:
            in_specs.append(
                pl.BlockSpec((bhf, nm, wp), im3, memory_space=pltpu.VMEM)
            )
            args.append(p2v_up)
        in_specs.append(pl.BlockSpec((bhf, wp, d), im3,
                                     memory_space=pltpu.VMEM))
        args.append(acc)
        return pl.pallas_call(
            functools.partial(
                _v_fused_kernel, p1=p1, p2=p2,
                diag=diag, bh=bhf, ct=ct, use_roll=use_roll, cfg=cfg,
                adaptive=adaptive,
                interpret=interpret, image_width=image_width,
                emit_d0=emit_d0, emit_qr=emit_qr, qr_src=qr_src,
            ),
            grid=(nbf,),
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((bhf, wp), im2, memory_space=pltpu.VMEM),
                pl.BlockSpec((bhf, wp), im2, memory_space=pltpu.VMEM),
            ] + ([
                pl.BlockSpec((bhf, wp), im2, memory_space=pltpu.VMEM),
                pl.BlockSpec((bhf, sp_w), im2, memory_space=pltpu.VMEM),
            ] if emit_qr else []),
            out_shape=[
                jax.ShapeDtypeStruct((hp, wp), jnp.float32),
                jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            ] + ([
                jax.ShapeDtypeStruct((hp, wp), jnp.float32),
                jax.ShapeDtypeStruct((hp, sp_w), jnp.float32),
            ] if emit_qr else []),
            scratch_shapes=[carry(), carry(), carry()],
            compiler_params=_VMEM_PARAMS_FUSED,
            interpret=interpret,
        )(*args)

    if h_from_hwd:
        pass  # h passes read `cost` directly (closed over in h_call)
    elif cost_whd is None:
        cost_whd = jnp.transpose(cost, (1, 0, 2))
    elif cost_whd.shape != (wp, hp, d):
        raise ValueError(
            f"cost_whd shape {cost_whd.shape} != padded {(wp, hp, d)}"
        )
    cp_f = cp_r = None
    if adaptive and _ADAPTIVE_CP_H and hwd and not h_from_hwd:
        # CP-stream h passes (VERDICT r4 #2): CP = C + P2_eff per
        # direction, int16 (<= maxc + P2 < 2^15), one fused XLA sweep
        # each — measured -0.7 ms across the two h passes at KITTI scale
        # (docs/kernels.md round-5 adaptive note), bit-identical.
        cp_f = cost_whd.astype(jnp.int16) + p2h_f[:, :, None].astype(
            jnp.int16
        )
        cp_r = cost_whd.astype(jnp.int16) + p2h_r[:, :, None].astype(
            jnp.int16
        )
    s_acc = h_call(False, None, cost_whd, cp=cp_f)
    s1 = s_acc
    s_acc = h_call(True, s_acc, cost_whd, cp=cp_r)
    if not hwd:
        s_acc = jnp.transpose(s_acc, (1, 0, 2))
    s2 = s_acc
    s_acc = v_down(s_acc)
    fused_out = v_up_fused(s_acc)
    disp_o, valid_o = fused_out[0], fused_out[1]
    if _expose_stages is not None:
        # Per-pass roofline instrumentation (eval/roofline.py): the stage
        # closures + real intermediates, so each pallas_call can be timed
        # in isolation with representative inputs. Debug-only; never set
        # on the hot path.
        _expose_stages.update(
            h_call=h_call, v_down=v_down, v_up_fused=v_up_fused,
            cost=cost, cost_whd=cost_whd, s1=s1, s2=s2, s3=s_acc,
            cp_f=cp_f, cp_r=cp_r,
            dims=dict(hp=hp, wp=wp, d=d, br=br, xc=xc, bh=bh,
                      acc_itemsize=dt.itemsize,
                      cost_itemsize=jnp.dtype(cost.dtype).itemsize),
        )
    # The LR-consistency gate runs inside the fused kernel (see
    # _v_fused_kernel): exporting packed winner maps and comparing in XLA
    # cost ~3 ms/frame of [H, W, D]-sweep traffic at KITTI scale.
    if emit_qr:
        return (
            disp_o[:h, :w], valid_o[:h, :w],
            fused_out[2][:h, :w], fused_out[3][:h, :],
        )
    if emit_d0:
        return disp_o[:h, :w], valid_o[:h, :w]
    return disp_o[:h, :w], valid_o[:h, :w].astype(bool)
