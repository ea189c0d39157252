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
    pspec = P(axis, *([None] * (coord_rank - 1)))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(tuple(pspec for _ in points), P(axis, None)),
        out_specs=jax.tree.map(lambda _: P(*([None] * (coord_rank - 1))), tuple(points)),
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

    return jax.jit(fn)(tuple(points), scalars)
