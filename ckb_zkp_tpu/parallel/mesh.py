"""Device mesh helpers."""

from __future__ import annotations

import jax
from jax.sharding import Mesh


SHARD_AXIS = "shard"


def make_mesh(n_devices: int | None = None, axis: str = SHARD_AXIS) -> Mesh:
    """1-D mesh over the first n devices (MSM/NTT shard axis)."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    assert n_devices <= len(devs), (n_devices, len(devs))
    import numpy as np

    return Mesh(np.array(devs[:n_devices]), (axis,))
