"""JubJub / Baby-JubJub twisted Edwards backends for the DL schemes.

Parity target: the reference's curve sweep runs bulletproofs over JubJub
and Baby_JubJub (/root/reference/README.md:283-288, arkworks
ed_on_bls12_381 / ed_on_bn254 behind the Curve trait).
"""

import random

import pytest

from ckb_zkp_tpu.circuits import Mini
from ckb_zkp_tpu.host.edwards_groups import (
    EdwardsPoint,
    get_baby_jubjub,
    get_edwards_curve,
    get_jubjub,
)

CURVES = [get_jubjub(), get_baby_jubjub()]


@pytest.fixture(params=CURVES, ids=[c.name for c in CURVES])
def curve(request):
    return request.param


def test_group_laws(curve):
    g = curve.g1
    G = curve.g1_gen
    assert g.is_on_curve(G)
    assert g.mul_unreduced(G, g.order).infinity
    assert not G.infinity
    P = g.mul(G, 123456789)
    Q = g.mul(G, 987654321)
    assert g.add(P, Q) == g.mul(G, 123456789 + 987654321)
    assert g.add(P, g.neg(P)).infinity
    assert g.sub(P, P).infinity
    # scalar field order matches the subgroup
    assert g.mul(G, curve.fr.modulus).infinity


def test_point_compression_roundtrip(curve):
    g = curve.g1
    rng = random.Random(5)
    for _ in range(8):
        P = g.mul(curve.g1_gen, rng.randrange(1, g.order))
        raw = g.point_to_bytes(P)
        assert len(raw) == g._nbytes
        assert g.point_from_bytes(raw) == P
    assert g.point_from_bytes(g.point_to_bytes(g.infinity())).infinity
    # tampered encodings reject
    raw = bytearray(g.point_to_bytes(g.mul(curve.g1_gen, 7)))
    raw[0] ^= 0xFF
    assert g.point_from_bytes(bytes(raw)) in (
        None,
        g.point_from_bytes(bytes(raw)),
    )  # decode either fails or yields a valid on-curve point
    pt = g.point_from_bytes(bytes(raw))
    if pt is not None:
        assert g.is_on_curve(pt)


def test_msm_matches_naive(curve):
    g = curve.g1
    rng = random.Random(11)
    pts = [g.mul(curve.g1_gen, rng.randrange(1, g.order)) for _ in range(20)]
    scalars = [rng.randrange(g.order) for _ in range(20)]
    want = g.infinity()
    for p, s in zip(pts, scalars):
        want = g.add(want, g.mul(p, s))
    assert g.msm(pts, scalars) == want


def test_bulletproofs_e2e(curve):
    from ckb_zkp_tpu.schemes.bulletproofs import arithmetic_circuit as bp

    rng = random.Random(7)
    gens, r1cs, proof = bp.create_random_proof(
        curve, Mini.power_on(2, 3, 10), rng
    )
    assert bp.verify_proof(curve, gens, proof, r1cs, [10])
    assert not bp.verify_proof(curve, gens, proof, r1cs, [11])


def test_bulletproofs_ark_roundtrip(curve):
    from ckb_zkp_tpu.schemes import bulletproofs
    from ckb_zkp_tpu.serialize.ark_schemes import ark_decode, ark_encode

    rng = random.Random(77)
    gens, r1cs, proof = bulletproofs.create_random_proof(
        curve, Mini.power_on(2, 3, 10), rng
    )
    raw = ark_encode(curve, proof)
    back = ark_decode(curve, raw, type(proof))
    assert bulletproofs.verify_proof(curve, gens, back, r1cs, [10])


def test_spartan_nizk_on_jubjub():
    from ckb_zkp_tpu.schemes.spartan import nizk

    curve = get_jubjub()
    rng = random.Random(55)
    r1cs = nizk.generate_r1cs(curve, Mini.power_off())
    params = nizk.generate_setup_parameters(
        curve, rng, r1cs.num_aux, r1cs.num_inputs
    )
    h1 = r1cs.r1cs_to_hash()
    h2 = nizk.params_to_hash(curve, params)
    proof = nizk.create_nizk_proof(
        curve, params, r1cs, Mini.power_on(2, 3, 10), h1, h2, rng
    )
    assert nizk.verify_nizk_proof(curve, params, r1cs, [10], proof, h1, h2)
    assert not nizk.verify_nizk_proof(curve, params, r1cs, [11], proof, h1, h2)


def test_cli_accepts_edwards_curves(tmp_path, monkeypatch):
    from ckb_zkp_tpu.cli.main import main as cli_main

    monkeypatch.chdir(tmp_path)
    cli_main(["setup", "spartan_nizk", "baby_jubjub", "mini"])
    cli_main(["prove", "bulletproofs", "jubjub", "mini", "2", "3", "10"])
    out = cli_main(
        ["verify", "proof_files/bulletproofs-jubjub-mini.proof.json"]
    )
    assert out in (None, 0, True)


def test_registry_resolution():
    assert get_edwards_curve("JubJub").name == "jubjub"
    assert get_edwards_curve("Baby-JubJub").name == "baby_jubjub"
    with pytest.raises(KeyError):
        get_edwards_curve("nope")
    assert isinstance(get_jubjub().g1_gen, EdwardsPoint)
