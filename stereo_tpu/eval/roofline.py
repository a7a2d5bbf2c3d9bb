"""Per-pass roofline measurement (VERDICT r2 #2, BASELINE.json:5
"kernels at speed-of-light per chip").

The single whole-pipeline "fraction of HBM speed-of-light" number earlier
rounds printed (19.5%) is uninterpretable by itself: the SGM pass kernels
are VPU-COMPUTE-bound, not bandwidth-bound, so the binding ceiling is the
vector unit's op rate, not 819 GB/s. This module measures, per pass:

  * seconds on the chip (chained in-jit timer, tunnel-proof);
  * bytes moved (exact: block reads/writes the kernel issues);
  * VPU ops issued (counted from the kernel source — see the per-pass
    breakdowns below);
  * BOTH bounds — bytes / HBM_peak and ops / VPU_peak — and the fraction
    of the TIGHTER (binding) one achieved.

The VPU peak itself is MEASURED on the same chip with a synthetic
elementwise kernel (measure_vpu_peak) rather than taken from a spec
sheet: clock/ALU counts for this exact part + compiler are then baked
into the anchor, and the resulting "X% of binding bound" is achieved-vs-
achievable, not achieved-vs-brochure.

Op counts per voxel (f32 elementwise VPU ops; one `min`/`add`/`select`/
`shift`/`compare` = 1; a cross-lane min-reduce over D=128 lanes = 7
butterfly steps; dtype converts = 1):

  h pass (_h_kernel, L-carry _upd_lcarry, per step over [BR, D]):
    reduce 7 + shifts 2 + cand 5 (add,min,min,add,min) + sub 1
    + cost cast 1 + add-c 1 + origin-select 1 + store cast 1      = 19
    (+2 on the reverse pass: accumulator read-add)
  v down pass (_v_kernel, normalized _upd, 3 carries for 8-path):
    per carry: upd 6 + origin-select 1 + add-c 1 + renorm 8 = 16
    3 carries 48 + diag sublane shifts 2 + sum 2 + acc RMW 2
    + cost cast 1                                                  = 55
  v up fused (_v_fused_kernel): the same 55 + the selection epilogue
    (packing 2, WTA reduce 7, subpixel 2 masked reduces ~18, LR shift
    pyramids 2 x 3*log2(D) ~ 42 + masked reduce 9 + compare/selects 8)
                                                         ~= 55 + 86 = 141
  cost kernel (census 5x5): per pixel: 24 window compares + packing
    ~ 50 ops/pixel amortized over D voxels -> per voxel: XOR 2 (two
    32-bit words) + popcount ~ 8 + shift/mask ~ 4                  = 14

These counts are estimates of issued ops, not cycles; lane shifts,
sublane relayouts and int<->f32 converts may not all sustain 1/lane/cycle
— the point is the ORDER: if measured/bound lands at tens of percent,
the kernel is near its compute ceiling and the 19.5%-of-HBM number is
explained; if it lands at a few percent, there is real headroom.
"""

from __future__ import annotations

import json
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import StereoConfig
from ..utils.timing import chained_seconds_per_call

HBM_PEAK_GBPS = 819.0  # TPU v5e

#: DERIVED theoretical VPU peak (VERDICT r4 #3): 8 sublanes x 128 lanes
#: x 4 ALUs x ~0.94 GHz ~= 3.85 f32 Tops/s on v5e. The measured anchor
#: (measure_vpu_peak) collapsed 3x between rounds 3 and 4 on the SAME
#: part (a helper-toolchain scheduling change degraded the synthetic
#: dependent-chain pattern while the production kernels kept sustaining
#: 3.4 counted TOPS) — so sol_fraction is now computed against this
#: FIXED reference and can never silently float with the anchor;
#: the measured anchor is still reported as a diagnostic and
#: sol_fraction_measured uses max(measured, derived) (one-sided error:
#: an anchor can only under-measure the true peak).
VPU_PEAK_DERIVED = 8 * 128 * 4 * 0.94e9

# Elementwise-op counts per PADDED voxel, per the header derivation.
# "cost" is the 1-word (5x5 census) count; multi-word descriptors add
# ~7 ops/voxel/word (XOR + per-byte SWAR stages; the final fold is paid
# once thanks to the round-4 byte-partial fusion) — see cost_ops_per_vox.
OPS_PER_VOX = {
    "cost": 14.0,
    "h_fwd": 19.0,
    "h_rev": 21.0,
    "v_down": 55.0,
    "v_up_fused": 141.0,
}


def cost_ops_per_vox(words: int) -> float:
    """Census cost-kernel ops/voxel for a ``words``-word descriptor."""
    return 7.0 * words + 7.0


def measure_vpu_peak(iters: int = 30, interpret: bool = False,
                     sweep: bool = False) -> float:
    """Achievable f32 elementwise ops/s on this chip (same timer as the
    pass measurements). Takes the BEST over differently-shaped anchor
    programs and ILP widths: round 4 saw a single anchor compile land at
    520-715 GOPS on the same part that measured ~3900 in round 3 (an
    unlucky schedule/compile is a one-sided error — the peak is a max,
    so the max over independent programs is the robust estimator).
    ``sweep=True`` widens the program set (VERDICT r4 #3 diagnosis runs).

    NOTE the reported fractions of record use VPU_PEAK_DERIVED — this
    measurement can only ever under-estimate the true peak, so it is a
    diagnostic, not the anchor (see docs/kernels.md round-5 note).
    """
    variants = [(512, 256, 4), (256, 512, 4)]
    if sweep:
        variants += [(512, 256, 8), (512, 512, 8), (256, 256, 16),
                     (512, 256, 2)]
    best = 0.0
    for rows, k, chains in variants:
        gops = _measure_vpu_peak_one(iters, interpret, rows, k, chains)
        print(json.dumps({
            "anchor_rows": rows, "anchor_k": k, "anchor_chains": chains,
            "gops": round(gops / 1e9, 1),
        }), flush=True)
        best = max(best, gops)
    return best


def _measure_vpu_peak_one(
    iters: int, interpret: bool, rows: int, k: int, chains: int = 4
) -> float:
    """One anchor program (see measure_vpu_peak).

    A Pallas kernel keeps each [rows, 128] block register/VMEM-resident
    and applies K dependent (add + min) op pairs spread over ``chains``
    independent accumulator chains before writing back — 2K ops per
    element per HBM round trip, so the measured rate is the vector
    unit's, not the memory system's. (A plain XLA elementwise chain of
    the same ops did NOT fuse: it timed exactly 819 GB/s of HBM sweeps —
    209 "GOPS" — which is how the r2 single-number roofline went wrong.
    A single serial chain measured 0.73 TOPS on v5e — ALU latency
    exposed — so the anchor needs ILP like the production kernels'.)
    """
    from jax.experimental import pallas as pl

    cols, blocks = 128, 64

    def kernel(x_ref, o_ref):
        x = x_ref[:]
        accs = [x + jnp.float32(i) * 0.25 for i in range(chains)]
        for _ in range(k // chains):
            accs = [
                jnp.minimum(a + 1.0, jnp.float32(3e38)) for a in accs
            ]
        tot = accs[0]
        for a in accs[1:]:
            tot = tot + a
        o_ref[:] = tot

    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(blocks,),
            in_specs=[pl.BlockSpec((rows, cols), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((rows, cols), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows * blocks, cols),
                                           jnp.float32),
            interpret=interpret,
        )(x)

    x = jnp.ones((rows * blocks, cols), jnp.float32)
    sec = chained_seconds_per_call(jax.jit(run), (x,), iters=iters)
    return 2.0 * (k // chains) * chains * rows * cols * blocks / sec


def per_pass_report(
    cfg: StereoConfig,
    shape: Tuple[int, int] = (375, 1242),
    iters: int = 30,
    vpu_peak: float = None,
    interpret: bool = False,
) -> List[dict]:
    """Measure each fused-pipeline pass in isolation on the current device.

    Reuses the REAL pallas_calls (sgm_wta_fused_pallas's stage closures,
    exposed via _expose_stages) with real intermediates as inputs, so the
    timed programs are exactly the production kernels.
    """
    from ..ops.pallas.cost_kernel import census_cost_volume_pallas
    from ..ops.pallas.sgm_kernel import _adaptive_maps, sgm_wta_fused_pallas
    from ..data.synthetic import make_pair
    from ..pipeline.pipeline import _vol_dtype

    if cfg.cost_fn != "census":
        raise NotImplementedError("per-pass roofline covers the census path")
    h, w = shape
    pair = make_pair(shape, max_disp=max(4, cfg.num_disparities * 3 // 4),
                     kind="shapes", texture="cloud", seed=0)
    left = jnp.asarray(pair.left)
    right = jnp.asarray(pair.right)
    adaptive = bool(cfg.adaptive_p2)

    vd = _vol_dtype(cfg, h, w)
    vol, vol_whd = census_cost_volume_pallas(
        left, right, cfg, out_dtype=vd, interpret=interpret
    )
    stages: dict = {}
    disp, valid = sgm_wta_fused_pallas(
        vol, cfg, cost_whd=vol_whd, true_shape=(h, w),
        acc_dtype=jnp.int16, image=left, _expose_stages=stages,
        interpret=interpret,
    )
    jax.block_until_ready(disp)
    dims = stages["dims"]
    hp, wp, d = dims["hp"], dims["wp"], dims["d"]
    nvox = hp * wp * d
    ci = dims["cost_itemsize"]
    ai = dims["acc_itemsize"]

    if vpu_peak is None:
        vpu_peak = measure_vpu_peak(
            iters=max(10, iters // 3), interpret=interpret
        )
        print(json.dumps({"vpu_peak_gops": round(vpu_peak / 1e9, 1)}),
              flush=True)

    h_call, v_down, v_up = (
        stages["h_call"], stages["v_down"], stages["v_up_fused"]
    )

    # PREFIX differencing: timing each pallas_call in isolation inflates
    # every stage by the chained timer's per-iteration overhead (input
    # bump write + aliasing copy + output reduction — measured ~0.5 ms
    # at KITTI scale, which made 5 isolated stages sum to 12 ms against
    # a 6.7 ms real frame). Instead time the REAL chain truncated after
    # each stage; per-pass = successive difference, overheads cancel
    # except the final-output reduction sweep, which is corrected for
    # explicitly below.
    hwd = dims["d"] >= 128

    # The fused path builds per-direction CP = C + P2_eff streams for the
    # adaptive h passes when _ADAPTIVE_CP_H (round 5); the prefixes must
    # time the PRODUCTION form, so rebuild them from the exposed maps.
    use_cp = stages.get("cp_f") is not None

    def make_prefix(n):
        def fn(l, r):
            vol, vol_whd = census_cost_volume_pallas(
                l, r, cfg, out_dtype=vd, interpret=interpret
            )
            if vol_whd is None:  # small-D kernels emit one layout only
                vol_whd = jnp.transpose(vol, (1, 0, 2))
            cp_f = cp_r = None
            if use_cp:
                from ..ops.pallas.sgm_kernel import _adaptive_maps

                p2h_f, p2h_r, _, _ = _adaptive_maps(
                    l, cfg, h, w, hp, wp, jnp.float32
                )
                cp_f = vol_whd.astype(jnp.int16) + p2h_f[
                    :, :, None
                ].astype(jnp.int16)
                cp_r = vol_whd.astype(jnp.int16) + p2h_r[
                    :, :, None
                ].astype(jnp.int16)
            if n == 0:
                return vol, vol_whd
            s = h_call(False, None, vol_whd, cp=cp_f)
            if n == 1:
                return s
            s = h_call(True, s, vol_whd, cp=cp_r)
            if n == 2:
                return s
            if not hwd:
                s = jnp.transpose(s, (1, 0, 2))
            s = v_down(s)
            if n == 3:
                return s
            return v_up(s)
        return fn

    # Output bytes of each prefix (what _result_scalar sweeps).
    out_bytes = [
        2 * nvox * ci,
        nvox * ai,
        nvox * ai,
        nvox * ai,
        8 * hp * wp,
    ]
    prefix_sec = []
    for n in range(5):
        sec = chained_seconds_per_call(
            jax.jit(make_prefix(n)), (left, right), iters=iters
        )
        print(json.dumps({"prefix": n, "ms": round(sec * 1e3, 4)}),
              flush=True)
        # Remove the timer's output-reduction sweep so differences are
        # pure stage time (sweep modeled at HBM peak; exact enough at
        # the 0.1 ms scale it corrects).
        prefix_sec.append(sec - out_bytes[n] / (HBM_PEAK_GBPS * 1e9))

    # (name, bytes, ops). Bytes = exact block traffic: every pass streams
    # the cost volume once; S is written (h_fwd), read+written (h_rev RMW,
    # v_down RMW), read (v_up); the cost kernel reads two u8 images and
    # writes BOTH volume layouts; v_up also writes f32 disp + i32 valid.
    # Small-D configs (hwd False) run an XLA (H,W,D)<->(W,H,D) transpose
    # between h_rev and v_down; prefix differencing lands its time in the
    # v_down diff, so model its HBM round trip in that row's byte bound
    # (and flag it) rather than misreport v_down as far from bound.
    t_xpose = 0 if hwd else 2 * nvox * ai
    stage_list = [
        ("cost", 2 * h * w + 2 * nvox * ci,
         cost_ops_per_vox(cfg.census_words) * nvox),
        ("h_fwd", nvox * ci + nvox * ai, OPS_PER_VOX["h_fwd"] * nvox),
        ("h_rev", nvox * ci + 2 * nvox * ai, OPS_PER_VOX["h_rev"] * nvox),
        ("v_down" if hwd else "v_down+xla_transpose",
         nvox * ci + 2 * nvox * ai + t_xpose,
         OPS_PER_VOX["v_down"] * nvox),
        (
            "v_up_fused",
            nvox * ci + nvox * ai + 8 * hp * wp,
            OPS_PER_VOX["v_up_fused"] * nvox,
        ),
    ]

    rows = []
    for i, (name, nbytes, nops) in enumerate(stage_list):
        sec = prefix_sec[i] - (prefix_sec[i - 1] if i else 0.0)
        sec = max(sec, 1e-9)
        t_bytes = nbytes / (HBM_PEAK_GBPS * 1e9)
        # sol_fraction of record anchors on the FIXED derived peak
        # (VERDICT r4 #3: the measured anchor proved toolchain-unstable);
        # the measured anchor contributes only one-sidedly via
        # max(measured, derived) in sol_fraction_measured.
        t_ops = nops / VPU_PEAK_DERIVED
        eff_peak = max(vpu_peak, VPU_PEAK_DERIVED)
        bound = "vpu" if t_ops > t_bytes else "hbm"
        t_bound = max(t_ops, t_bytes)
        rows.append({
            "pass": name,
            "ms": round(sec * 1e3, 4),
            "bytes_mb": round(nbytes / 1e6, 1),
            "gops": round(nops / 1e9, 2),
            "achieved_tops": round(nops / sec / 1e12, 2),
            "hbm_bound_ms": round(t_bytes * 1e3, 4),
            "vpu_bound_ms": round(t_ops * 1e3, 4),
            "binding": bound,
            "sol_fraction": round(t_bound / sec, 3),
            "sol_fraction_measured": round(
                max(nops / eff_peak, t_bytes) / sec, 3
            ),
        })
    if adaptive:
        # The per-direction effective-P2 map precompute runs in XLA once
        # per frame (8 maps + pads + transposes at KITTI scale); the pass
        # rows above time the kernels with the maps as side inputs, so
        # this row completes the adaptive accounting (VERDICT r3 #4).
        # Bounds (OPS_PER_VOX) are the NON-adaptive op counts: adaptive
        # adds per-grid-step map relayouts + per-row map slices the
        # counts don't model, so adaptive sol_fractions are upper bounds.
        dims2 = stages["dims"]

        def maps_fn(img):
            return _adaptive_maps(
                img, cfg, h, w, dims2["hp"], dims2["wp"], jnp.float32
            )

        sec_m = chained_seconds_per_call(
            jax.jit(maps_fn), (left,), iters=iters
        )
        n_maps = 8 if cfg.num_paths == 8 else 4
        rows.append({
            "pass": "adaptive_maps_xla",
            "ms": round(sec_m * 1e3, 4),
            "bytes_mb": round(n_maps * hp * wp * 4 / 1e6, 1),
            "note": "per-frame XLA precompute of the per-direction "
                    "effective-P2 maps (not in the chain rows above)",
        })
    rows.append({
        "pass": "TOTAL(chain)",
        "ms": round(prefix_sec[-1] * 1e3, 4),
        "vpu_peak_gops": round(vpu_peak / 1e9, 1),
        "vpu_peak_derived_gops": round(VPU_PEAK_DERIVED / 1e9, 1),
        "adaptive_p2": adaptive,
        "note": "full cost->SGM->epilogue chain (reduction-sweep "
                "corrected); per-pass rows are successive prefix "
                "differences of this chain",
    })
    return rows


def main():  # pragma: no cover - driven manually on the TPU
    import argparse

    from ..config import PRESETS

    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="kitti_sgm8_128")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--adaptive", action="store_true",
                    help="measure the adaptive-P2 variant (VERDICT r3 #4)")
    ap.add_argument("--p2-min", type=int, default=17)
    ap.add_argument("--anchor-sweep", action="store_true",
                    help="widen the measured-VPU-peak anchor program set "
                         "(VERDICT r4 #3 diagnosis)")
    args = ap.parse_args()
    cfg = PRESETS[args.preset]
    if args.adaptive:
        cfg = cfg.replace(adaptive_p2=True, p2_min=args.p2_min)
    vpu = None
    if args.anchor_sweep:
        vpu = measure_vpu_peak(iters=args.iters, sweep=True)
        print(json.dumps({"vpu_peak_gops_best": round(vpu / 1e9, 1)}))
    rows = per_pass_report(cfg, iters=args.iters, vpu_peak=vpu)
    for r in rows:
        print(json.dumps(r))


if __name__ == "__main__":  # pragma: no cover
    main()
