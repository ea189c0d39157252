"""Sharded Pippenger MSM: points/scalars per chip, EC-fold across the mesh.

Replaces the reference's rayon-parallel arkworks MSM with mesh parallelism:
each device runs the full windowed Pippenger on its point shard, then the
per-shard Jacobian partials are all-gathered over ICI and tree-folded (an
EC-group `psum`). N/D work per chip, one tiny collective at the end.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..ops.msm import DeviceCurveGroup
from ..ops.scan_utils import blocked_reduce
from .mesh import SHARD_AXIS


# one jitted shard-mapped MSM per (curve, group, mesh, axis, coord rank):
# rebuilding jax.jit(fn) per call re-traced AND re-compiled the identical
# program for every MSM in a sharded prove (3x for the G1 a/h/l queries) —
# the dominant cost of the 8-device CPU dryrun (round-5 profile)
_SHARDED_JITS: dict = {}


def _sharded_msm_fn(dg: DeviceCurveGroup, mesh, axis: str, coord_rank: int):
    key = (dg.curve.name, dg.group, mesh, axis, coord_rank)
    fn = _SHARDED_JITS.get(key)
    if fn is not None:
        return fn
    pspec = P(axis, *([None] * (coord_rank - 1)))
    out_spec = P(*([None] * (coord_rank - 1)))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=((pspec,) * 3, P(axis, None)),
        out_specs=(out_spec,) * 3,
        # identity constants (bucket infinities, scan carries) are replicated
        # while data is per-shard; skip the varying-axis type check
        check_vma=False,
    )
    def fn(pts, s):
        part = dg._msm_impl(pts, s)
        gathered = jax.tree.map(
            lambda c: jax.lax.all_gather(c, axis, axis=0), part
        )
        return blocked_reduce(dg.p_add, gathered, dg.p_identity())

    fn = jax.jit(fn)
    _SHARDED_JITS[key] = fn
    return fn


def msm_sharded(dg: DeviceCurveGroup, points, scalars, mesh, axis: str = SHARD_AXIS):
    """points: Jacobian (X,Y,Z) leading axis N; scalars: (N, L) canonical.

    Returns a single (replicated) Jacobian point.
    """
    d = mesh.shape[axis]
    n = scalars.shape[0]
    np2 = max(8 * d, 1 << (n - 1).bit_length())
    if np2 != n:
        pad = dg.p_identity((np2 - n,))
        points = jax.tree.map(
            lambda c, z: jnp.concatenate([c, z], axis=0), tuple(points), pad
        )
        scalars = jnp.concatenate(
            [scalars, jnp.zeros((np2 - n, scalars.shape[1]), scalars.dtype)], axis=0
        )

    coord_rank = jax.tree.leaves(points)[0].ndim  # 2 for G1, 3 for G2
    fn = _sharded_msm_fn(dg, mesh, axis, coord_rank)
    return fn(tuple(points), scalars)
