"""Multi-host (multi-process) execution: the distributed comm backend.

The reference parallelizes with rayon inside one process (e.g.
/root/reference/groth16/src/prover.rs:124-211); scaling past one host is out
of its reach. The TPU-native story is JAX's multi-controller SPMD: every
host runs THIS SAME program, `jax.distributed.initialize` wires the
processes into one runtime, and `jax.devices()` then spans all hosts. Every
mesh-parameterized path in this framework (sharded MSM + four-step NTT in
parallel/, `create_proof_from_shape(mesh=...)`) is written against
`shard_map` + named-axis collectives (psum / all_to_all / all_gather), which
XLA lowers to ICI transfers within a host and DCN between hosts — so the
single-host sharded code IS the multi-host code; no NCCL/MPI port needed.

Topology guidance (scaling-book recipe): lay the shard axis out so
all_to_all stages of the four-step NTT ride ICI (devices of one host
adjacent on the axis — the default device order already is), keeping only
the coarse inter-host exchange on DCN.

Smoke-tested in tests/test_multihost.py with two real processes over the
Gloo CPU collectives backend (the TPU runtime swaps in ICI/DCN transports
transparently).
"""

from __future__ import annotations

import jax

from .mesh import SHARD_AXIS, make_mesh


def init_multihost(
    coordinator: str,
    num_processes: int,
    process_id: int,
    local_device_ids=None,
) -> None:
    """Join this process into a multi-controller JAX runtime.

    Call before any JAX computation, on every participating host:

        init_multihost("host0:1234", num_processes=N, process_id=rank)

    After this, `jax.devices()` is global, `jax.local_devices()` is this
    host's slice, and `global_mesh()` spans every chip in the job.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def global_mesh(axis: str = SHARD_AXIS):
    """1-D mesh over every device of the (possibly multi-host) job."""
    return make_mesh(len(jax.devices()), axis)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def shard_put(x, mesh, spec):
    """Place a host-replicated array as a sharded global array.

    Every process must call this with the SAME logical value; each device
    keeps only its shard. This is the bridge from host-side witness/circuit
    data into the mesh-sharded provers on a multi-host job.
    """
    from jax.sharding import NamedSharding

    return jax.device_put(x, NamedSharding(mesh, spec))
