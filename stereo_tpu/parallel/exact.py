"""Exact multi-device pipeline via sharding constraints (Ulysses analog, P6).

SGM's two pass families want conflicting layouts: row scans want full rows
device-local, column/diagonal scans want full columns (of the possibly
sheared volume) device-local. Instead of cross-device sequential wavefronts,
this mode resharding the cost volume between pass families — exactly the
Ulysses head<->sequence trick (SURVEY.md §2.2 P6): annotate the inputs of
each family with `with_sharding_constraint` and let XLA insert the
`all_to_all` on ICI.

Because every scan runs complete and device-local, the result is
**bit-identical** to the single-device golden pipeline — the property the
distributed tests assert (SURVEY.md §4.3). Bounded-error halo tiling (P2/P5)
lives in parallel/tiling.py; benchmarks compare the two.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import StereoConfig
from ..pipeline.pipeline import StereoResult, compute_disparity


def _annotators(mesh: Mesh):
    """(rows_local, cols_local) pytree annotators for sgm_aggregate.

    rows_local shards axis 0 (H) over every non-batch mesh device, keeping
    full rows local; cols_local shards axis 1 (W or sheared Wp). Leaves of
    rank 2 ([H, W] masks/images) and rank 3 ([H, W, D] volumes) both get
    their leading spatial axes from the same spec.
    """
    axes = ("ty", "tx")

    def make(axis: int):
        def annotate(tree):
            def one(x):
                if x is None:
                    return None
                spec = [None] * x.ndim
                spec[axis] = axes
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P(*spec))
                )

            return jax.tree_util.tree_map(one, tree, is_leaf=lambda v: v is None)

        return annotate

    return make(0), make(1)


def build_exact_pipeline(
    cfg: StereoConfig,
    mesh: Mesh,
    donate: bool = False,
):
    """Jitted ``(left, right) -> StereoResult`` distributed over ``mesh``.

    Inputs arrive row-sharded; outputs are replicated (the "all-gather
    per-tile disparity maps" of BASELINE.json:5, realized as an XLA
    all_gather inserted by the output sharding).
    """
    rows_local, cols_local = _annotators(mesh)

    def fn(left, right):
        left = rows_local(left)
        right = rows_local(right)
        return compute_disparity(
            left, right, cfg, constrain=(rows_local, cols_local)
        )

    out_sharding = StereoResult(
        disp=NamedSharding(mesh, P()), valid=NamedSharding(mesh, P())
    )
    donate_argnums = (0, 1) if donate else ()
    return jax.jit(
        fn, out_shardings=out_sharding, donate_argnums=donate_argnums
    )
