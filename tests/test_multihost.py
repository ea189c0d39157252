"""Two-process multi-host test (SURVEY §5 distributed comm backend).

Launches two REAL processes that join one JAX job via
jax.distributed.initialize (Gloo CPU collectives; the TPU runtime swaps in
ICI/DCN transparently) and, across the 4-device global mesh: (1) run the
mesh-sharded four-step NTT, each process verifying its own shards, and
(2) create a FULL Groth16 proof with the sharded prover
(create_proof_from_shape(mesh=global_mesh())), asserting bit-equality with
the single-process proof and verifier acceptance.
"""

import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
CHILD = os.path.join(HERE, "multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_ntt():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children set their own device counts
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(port), str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for pr in procs:
            # generous: the mesh-prove leg pays fresh XLA compiles on a cold
            # cache (~15 min on this 2-vCPU box); warm-cache runs are fast
            out, _ = pr.communicate(timeout=1500)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for pr in procs:
            pr.kill()
        pytest.fail("multihost children timed out")
    for pid, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"MH_OK {pid}" in out, out[-3000:]
