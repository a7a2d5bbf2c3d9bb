"""Post-filter Pallas kernels (SURVEY.md §2.1 C10).

The golden median_3x3 (ops/postprocess.py) is 19 elementwise min/max ops
over 9 pad-and-slice shifted copies of the [H, W] map — trivially
VPU-bound, yet XLA's lowering of the shifted-window fusion measured
1.15 ms/frame at KITTI scale (~12% of the whole pipeline). This kernel
runs the same Paeth exchange network in VMEM: the three row-shifted
views are precomputed in XLA (cheap edge-replicated sublane shifts) and
blocked identically, and the three column shifts of each are in-register
lane concats, so one grid step does 9 shifted loads' worth of work from
3 reads. Bit-exact vs the golden filter on the true frame region.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * (1 << 20))

#: Exchange network (Paeth): after these swaps v[4] is the median of 9.
_NET = (
    (1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2), (4, 5),
    (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4), (2, 5), (4, 7),
    (4, 2), (6, 4), (4, 2),
)


def _median_kernel(up_ref, mid_ref, dn_ref, out_ref):
    v = [None] * 9
    for dy, ref in ((0, up_ref), (1, mid_ref), (2, dn_ref)):
        m = ref[:]
        left = jnp.concatenate([m[:, :1], m[:, :-1]], axis=1)
        right = jnp.concatenate([m[:, 1:], m[:, -1:]], axis=1)
        v[dy * 3 + 0] = left
        v[dy * 3 + 1] = m
        v[dy * 3 + 2] = right

    for i, j in _NET:
        lo = jnp.minimum(v[i], v[j])
        hi = jnp.maximum(v[i], v[j])
        v[i], v[j] = lo, hi
    out_ref[:] = v[4]


def median_3x3_pallas(disp: jnp.ndarray, interpret: bool = False
                      ) -> jnp.ndarray:
    """3x3 median, bit-exact vs ops/postprocess.median_3x3.

    Edge policy is replicate, exactly like the golden filter's edge pad:
    the frame is edge-padded to tile multiples in XLA, so the kernel's
    edge-replicating in-register shifts see the true border values, and
    the padded region is garbage the crop discards.
    """
    h, w = disp.shape
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    p = jnp.pad(disp, ((0, hp - h), (0, wp - w)), mode="edge")
    # Row-shifted views (edge-replicated at the true frame border: the
    # pad above already replicated row h-1 into the padding).
    up = jnp.concatenate([p[:1], p[:-1]], axis=0)
    dn = jnp.concatenate([p[1:], p[-1:]], axis=0)

    bh = max(8, min(hp, (1 << 21) // (wp * 4) // 8 * 8))
    while hp % bh:
        bh -= 8
    im = lambda i: (i, 0)
    spec = pl.BlockSpec((bh, wp), im, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _median_kernel,
        grid=(hp // bh,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((hp, wp), disp.dtype),
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(up, p, dn)
    return out[:h, :w]
