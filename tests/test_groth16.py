"""Groth16 end-to-end on the Mini circuit.

Mirrors the reference's golden-path integration test
(/root/reference/groth16/tests/mini.rs:46-97): setup -> prove -> verify, plus
rejection of wrong public inputs. (De)serialization round-trip parity is
covered in test_serialize once the serializer lands.
"""

import random

import pytest

from ckb_zkp_tpu.circuits import Mini
from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.r1cs import ConstraintSystem, SynthesisMode
from ckb_zkp_tpu.schemes import groth16


@pytest.fixture(scope="module", params=["bn254", "bls12_381"])
def curve(request):
    return get_curve(request.param)


@pytest.fixture(scope="module")
def params(curve):
    rng = random.Random(42)
    return groth16.generate_random_parameters(Mini.power_off(), curve, rng)


def test_mini_constraint_satisfaction(curve):
    cs = ConstraintSystem(SynthesisMode.PROVE)
    Mini.power_on(2, 3, 10).generate_constraints(cs)
    assert cs.is_satisfied(curve.fr.modulus)
    cs2 = ConstraintSystem(SynthesisMode.PROVE)
    Mini.power_on(2, 3, 11).generate_constraints(cs2)
    assert cs2.which_is_unsatisfied(curve.fr.modulus) == "x * (y + 2) = z"


@pytest.mark.parametrize("zk", [True, False])
def test_groth16_mini_end_to_end(curve, params, zk):
    if zk and curve.name != "bn254":
        pytest.skip("zk prove exercised on bn254; bls12_381 covers no_zk")
    rng = random.Random(7)
    circuit = Mini.power_on(2, 3, 10)
    if zk:
        proof = groth16.create_random_proof(params, circuit, rng)
    else:
        proof = groth16.create_proof_no_zk(params, circuit)
    assert curve.g1.is_on_curve(proof.a)
    assert curve.g2.is_on_curve(proof.b)
    assert curve.g1.is_on_curve(proof.c)
    pvk = groth16.prepare_verifying_key(curve, params.vk)
    assert groth16.verify_proof(curve, pvk, proof, [10])
    assert not groth16.verify_proof(curve, pvk, proof, [11])
    assert not groth16.verify_proof(curve, pvk, proof, [10, 1])


def test_qap_host_path_matches_device(curve):
    """The host-int QAP path (used for small circuits on the TPU tunnel,
    where per-shape compiles cost minutes) must agree with the device path
    exactly: witness map h coefficients and setup instance-map evaluations."""
    from ckb_zkp_tpu.r1cs import SynthesisMode, synthesize
    from ckb_zkp_tpu.schemes.groth16.qap import QapMatrices

    p = curve.fr.modulus
    shape = synthesize(Mini.power_on(2, 3, 10), p, SynthesisMode.PROVE)
    qap = QapMatrices(shape, curve.fr)
    assert not qap.host_mode  # CPU backend keeps the device path
    z = shape.full_assignment()
    h_dev = qap.df.decode(qap.witness_map(qap.df.encode(z)))
    assert h_dev[qap.m - 1] == 0  # top coefficient vanishes exactly
    assert qap.witness_map_host(z) == h_dev[: qap.m - 1]
    t = 0x1234567
    u_dev, v_dev, w_dev = (qap.df.decode(x) for x in qap.evaluations_at(t))
    hu, hv, hw = qap.evaluations_at_host(t)
    assert (hu, hv, hw) == (u_dev, v_dev, w_dev)


def test_groth16_bench_circuits_end_to_end():
    """The bench circuits (square chain / product) prove and verify through
    the shape-level API bench.py drives."""
    from ckb_zkp_tpu.bench_circuits import (
        product_circuit_shape,
        square_chain_shape,
    )
    from ckb_zkp_tpu.schemes.groth16.prover import create_proof_from_shape

    curve = get_curve("bn254")
    p = curve.fr.modulus
    for mk in (square_chain_shape, product_circuit_shape):
        shape = mk(64, p)
        params = groth16.generate_parameters_from_shape(
            shape, curve, alpha=5, beta=7, gamma=11, delta=13,
            t=0xABCDEF0123456789,
        )
        proof = create_proof_from_shape(params, shape, 0, 0)
        pvk = groth16.prepare_verifying_key(curve, params.vk)
        assert groth16.verify_proof(
            curve, pvk, proof, shape.input_assignment[1:]
        )
        bad = list(shape.input_assignment[1:])
        bad[0] = (bad[0] + 1) % p
        assert not groth16.verify_proof(curve, pvk, proof, bad)
        # zk path exercises the r != 0 branch (b_g1 MSM not skipped)
        proof_zk = create_proof_from_shape(params, shape, 3, 4)
        assert groth16.verify_proof(
            curve, pvk, proof_zk, shape.input_assignment[1:]
        )


def test_witness_map_fused_matches_unfused():
    """The single-program fused witness map (qap.witness_map_fused) is
    bit-identical to the staged to_mont -> witness_map -> from_mont path at
    a four-step-sized domain (m = 2^14 = QapMatrices.FUSED_MIN)."""
    import numpy as np
    import jax.numpy as jnp

    from ckb_zkp_tpu.bench_circuits import square_chain_shape
    from ckb_zkp_tpu.ops.field import device_field
    from ckb_zkp_tpu.schemes.groth16.qap import QapMatrices

    curve = get_curve("bn254")
    fr = device_field(curve.fr)
    shape = square_chain_shape((1 << 14) - 2, curve.fr.modulus)
    qap = QapMatrices(shape, curve.fr, host_mode=False)
    assert qap.m == QapMatrices.FUSED_MIN

    raw = shape.witness_limbs(fr.L, qap.num_cols_pad)
    z_can = jnp.asarray(raw)
    hpad = max(qap.num_cols_pad, qap.m)
    h_fused = qap.witness_map_fused(z_can, out_len=hpad)

    h = qap.witness_map(fr.to_mont(z_can))
    h_can = fr.from_mont(h)
    np.testing.assert_array_equal(
        np.asarray(h_fused[: qap.m]), np.asarray(h_can)
    )
    assert not np.asarray(h_fused[qap.m :]).any()
