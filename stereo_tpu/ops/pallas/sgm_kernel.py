"""Fused SGM path aggregation as Pallas TPU kernels.

The flagship kernel (SURVEY.md §2.1 C6): the reference runs one OpenCL
kernel per path direction, each re-streaming the cost volume. Here ALL
EIGHT Hirschmueller paths run in TWO passes over the HBM-resident volume:

  * forward kernel (grid walks row blocks top-down): left-to-right and
    right-to-left scans over the x axis (carry [BH, D] in registers),
    plus top-to-bottom, down-right and down-left paths whose carries are
    full [W, D] rows persisting in VMEM scratch across grid steps — the
    diagonal paths are just the vertical carry shifted one pixel along the
    sublane (x) axis, so no shearing and no extra memory traffic;
  * backward kernel (grid walks row blocks bottom-up, reverse index_map):
    bottom-to-top, up-right, up-left, accumulated IN PLACE onto the
    forward sums via input/output aliasing.

Total HBM traffic: 2 cost reads + 1 write + 1 read-modify-write of S —
independent of path count, vs 8 volume sweeps in the kernel-per-direction
scheme. Fresh-start masking uses GLOBAL row/column indices, so row/column
padding to block multiples never leaks into real pixels.

Bit-exact oracle: stereo_tpu.ops.sgm.sgm_aggregate (tests/ops/test_pallas_sgm.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import StereoConfig

def _pick_bh(w: int, d: int, itemsize: int, budget_bytes: int = 2 << 20) -> int:
    """Rows per grid step: cap the [BH, W, D] block near `budget_bytes` so
    in/out double buffers + the [W, D] carries stay inside scoped VMEM
    (16 MB on v5e); at most 8 rows (one sublane tile for the horizontal
    [BH, D] scan slabs)."""
    return max(1, min(8, budget_bytes // (w * d * itemsize)))


def _upd(prev: jnp.ndarray, p1: int, p2: int) -> jnp.ndarray:
    """cand - m of the SGM recurrence, vectorized over the D lane axis.

    prev: [..., D]. Returns min(prev, prev<<1 + P1, prev>>1 + P1, m + P2) - m
    with edge-replicated d+-1 shifts (replica is never the winner since
    P1 >= 0, matching the golden lax.scan recurrence).
    """
    m = jnp.min(prev, axis=-1, keepdims=True)
    dn = jnp.concatenate([prev[..., :1], prev[..., :-1]], axis=-1) + p1
    up = jnp.concatenate([prev[..., 1:], prev[..., -1:]], axis=-1) + p1
    cand = jnp.minimum(jnp.minimum(prev, m + p2), jnp.minimum(dn, up))
    return cand - m


def _fwd_kernel(
    cost_ref, out_ref, vc_ref, drc_ref, dlc_ref, *, p1, p2, true_w, diag, bh_s
):
    """Forward pass: L2R + R2L + T2B (+ down-right + down-left)."""
    pid = pl.program_id(0)
    bh, w, d = cost_ref.shape

    # --- horizontal scans over x, carry [BH, D] ---
    def h_fwd(x, carry):
        c = cost_ref[:, x, :]
        l = jnp.where(x == 0, c, c + _upd(carry, p1, p2))
        out_ref[:, x, :] = l
        return l

    jax.lax.fori_loop(0, w, h_fwd, jnp.zeros((bh, d), cost_ref.dtype))

    def h_bwd(i, carry):
        x = w - 1 - i
        c = cost_ref[:, x, :]
        l = jnp.where(x == true_w - 1, c, c + _upd(carry, p1, p2))
        out_ref[:, x, :] = out_ref[:, x, :] + l
        return l

    jax.lax.fori_loop(0, w, h_bwd, jnp.zeros((bh, d), cost_ref.dtype))

    # --- vertical + diagonal rows, carries [W, D] persist across blocks ---
    x_iota = jax.lax.broadcasted_iota(jnp.int32, (w, d), 0)
    v = vc_ref[:]
    dr = drc_ref[:] if diag else None
    dl = dlc_ref[:] if diag else None
    for r in range(bh_s):
        c = cost_ref[r]
        is_first = jnp.logical_and(pid == 0, r == 0)
        lv = jnp.where(is_first, c, c + _upd(v, p1, p2))
        acc = lv
        if diag:
            # down-right: predecessor (y-1, x-1) -> carry shifted +1 in x;
            # fresh start at the global left edge (x == 0).
            dr_sh = jnp.concatenate([dr[:1], dr[:-1]], axis=0)
            ldr = jnp.where(
                jnp.logical_or(is_first, x_iota == 0),
                c,
                c + _upd(dr_sh, p1, p2),
            )
            # down-left: predecessor (y-1, x+1); fresh at global right edge.
            dl_sh = jnp.concatenate([dl[1:], dl[-1:]], axis=0)
            ldl = jnp.where(
                jnp.logical_or(is_first, x_iota == true_w - 1),
                c,
                c + _upd(dl_sh, p1, p2),
            )
            acc = acc + ldr + ldl
            dr, dl = ldr, ldl
        out_ref[r] = out_ref[r] + acc
        v = lv
    vc_ref[:] = v
    if diag:
        drc_ref[:] = dr
        dlc_ref[:] = dl


def _bwd_kernel(
    cost_ref, sfwd_ref, out_ref, vc_ref, urc_ref, ulc_ref,
    *, p1, p2, true_h, true_w, diag, bh_s,
):
    """Backward pass: B2T (+ up-right + up-left), accumulated onto s_fwd."""
    pid = pl.program_id(0)
    nb = pl.num_programs(0)
    bh, w, d = cost_ref.shape
    block = nb - 1 - pid  # reverse index_map walks blocks bottom-up

    x_iota = jax.lax.broadcasted_iota(jnp.int32, (w, d), 0)
    v = vc_ref[:]
    ur = urc_ref[:] if diag else None
    ul = ulc_ref[:] if diag else None
    for r in range(bh_s - 1, -1, -1):
        c = cost_ref[r]
        grow = block * bh_s + r
        is_first = grow == true_h - 1  # bottom image row: fresh start
        lv = jnp.where(is_first, c, c + _upd(v, p1, p2))
        acc = lv
        if diag:
            # up-right: predecessor (y+1, x-1) -> carry shifted +1 in x.
            ur_sh = jnp.concatenate([ur[:1], ur[:-1]], axis=0)
            lur = jnp.where(
                jnp.logical_or(is_first, x_iota == 0),
                c,
                c + _upd(ur_sh, p1, p2),
            )
            # up-left: predecessor (y+1, x+1).
            ul_sh = jnp.concatenate([ul[1:], ul[-1:]], axis=0)
            lul = jnp.where(
                jnp.logical_or(is_first, x_iota == true_w - 1),
                c,
                c + _upd(ul_sh, p1, p2),
            )
            acc = acc + lur + lul
            ur, ul = lur, lul
        out_ref[r] = sfwd_ref[r] + acc
        v = lv
    vc_ref[:] = v
    if diag:
        urc_ref[:] = ur
        ulc_ref[:] = ul


def sgm_aggregate_pallas(
    cost: jnp.ndarray,
    cfg: StereoConfig,
    interpret: bool = False,
) -> jnp.ndarray:
    """S(p, d) = sum of 4/8 SGM path costs, two fused HBM passes.

    Args:
      cost: [H, W, D] integer cost volume (int16 recommended: L is bounded
        by max_unary_cost + P2, and 8 path sums stay < 2^15).
      cfg: static config; num_paths in {4, 8}; adaptive_p2 unsupported here
        (golden path covers it).

    Returns: [H, W, D] summed volume, same dtype, bit-exact vs the golden
    sgm_aggregate for full-frame (all-valid) inputs.
    """
    if cfg.num_paths == 0:
        return cost
    if cfg.adaptive_p2:
        raise NotImplementedError("adaptive_p2: use the golden sgm_aggregate")
    h, w, d = cost.shape
    diag = cfg.num_paths == 8
    bh = _pick_bh(w, d, cost.dtype.itemsize)
    hp = -(-h // bh) * bh
    if hp != h:
        cost = jnp.pad(cost, ((0, hp - h), (0, 0), (0, 0)))
    nb = hp // bh
    dt = cost.dtype
    p1, p2 = int(cfg.p1), int(cfg.p2)

    carry = lambda: pltpu.VMEM((w, d), dt)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * (1 << 20))
    fwd = pl.pallas_call(
        functools.partial(
            _fwd_kernel, p1=p1, p2=p2, true_w=w, diag=diag, bh_s=bh
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bh, w, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bh, w, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, w, d), dt),
        scratch_shapes=[carry(), carry(), carry()],
        compiler_params=params,
        interpret=interpret,
    )
    s_fwd = fwd(cost)

    bwd = pl.pallas_call(
        functools.partial(
            _bwd_kernel, p1=p1, p2=p2, true_h=h, true_w=w, diag=diag, bh_s=bh
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bh, w, d), lambda i: (nb - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, w, d), lambda i: (nb - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bh, w, d), lambda i: (nb - 1 - i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, w, d), dt),
        scratch_shapes=[carry(), carry(), carry()],
        input_output_aliases={1: 0},
        compiler_params=params,
        interpret=interpret,
    )
    s = bwd(cost, s_fwd)
    return s[:h] if hp != h else s
