"""Golden-byte pins for the ark-0.2 wire formats (VERDICT r2 item 10).

With no cargo on this box, the closest substitute for Rust cross-validation
is an INDEPENDENT 20-line encoder implementing the documented ark-serialize
0.2 rules from scratch (little-endian fixed-width `BigInteger` words, SW
flags `Infinity = 1 << 6` / `PositiveY = 1 << 7` OR'd into the top byte,
G2's Fq2 as c0 then c1 with flags on c1, `y is positive <=> y > p - y`),
plus literal byte pins for the curve generators. If the production codecs
ever drift from the ark layout, these fail.

Rule sources: ark-serialize 0.2 flags.rs (SWFlags), ark-ec 0.2
short_weierstrass_jacobian.rs serialize(), ark-ff 0.2 Fp::serialize.
"""

import io

from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.serialize.ark import FieldCodec, G1Codec, G2Codec

FLAG_INF = 1 << 6
FLAG_POS = 1 << 7


def ref_fp_bytes(x: int, p: int, nbytes: int, flags: int = 0) -> bytes:
    raw = bytearray((x % p).to_bytes(nbytes, "little"))
    raw[-1] |= flags
    return bytes(raw)


def ref_g1_bytes(curve, pt) -> bytes:
    p = curve.fq.modulus
    nb = curve.fq.nbytes
    if pt.infinity:
        return ref_fp_bytes(0, p, nb, FLAG_INF)
    flags = FLAG_POS if pt.y > (p - pt.y) % p else 0
    return ref_fp_bytes(pt.x, p, nb, flags)


def ref_g2_bytes(curve, pt) -> bytes:
    p = curve.fq.modulus
    nb = curve.fq.nbytes
    if pt.infinity:
        return ref_fp_bytes(0, p, nb) + ref_fp_bytes(0, p, nb, FLAG_INF)
    y0, y1 = pt.y
    # ark-0.2 QuadExtField ordering: y > -y iff (c1, c0) lexicographic
    neg = ((p - y0) % p, (p - y1) % p)
    pos = (y1, y0) > (neg[1], neg[0])
    return ref_fp_bytes(pt.x[0], p, nb) + ref_fp_bytes(
        pt.x[1], p, nb, FLAG_POS if pos else 0
    )


def test_bn254_generator_literals():
    """bn254 G1 generator is (1, 2); 2 < p - 2 so the y-sign flag is clear:
    the compressed encoding is literally 0x01 then 31 zero bytes."""
    curve = get_curve("bn254")
    g1c = G1Codec(curve)
    got = g1c.to_bytes(curve.g1_gen)
    assert got == bytes.fromhex("01" + "00" * 31)
    # infinity: zero x with only the infinity flag in the top byte
    inf = g1c.to_bytes(curve.g1.infinity)
    assert inf == bytes(31) + bytes([FLAG_INF])


def test_g1_encoding_matches_independent_rules():
    for name in ("bn254", "bls12_381"):
        curve = get_curve(name)
        g1c = G1Codec(curve)
        pts = [
            curve.g1_gen,
            curve.g1.mul(curve.g1_gen, 7),
            curve.g1.neg(curve.g1_gen),
            curve.g1.infinity,
        ]
        for pt in pts:
            assert g1c.to_bytes(pt) == ref_g1_bytes(curve, pt), (name, pt)
            # decode closes the loop
            back = g1c.read(io.BytesIO(g1c.to_bytes(pt)))
            assert back == pt


def test_g2_encoding_matches_independent_rules():
    for name in ("bn254", "bls12_381"):
        curve = get_curve(name)
        g2c = G2Codec(curve)
        pts = [
            curve.g2_gen,
            curve.g2.mul(curve.g2_gen, 11),
            curve.g2.neg(curve.g2_gen),
            curve.g2.infinity,
        ]
        for pt in pts:
            assert g2c.to_bytes(pt) == ref_g2_bytes(curve, pt), (name, pt)
            back = g2c.read(io.BytesIO(g2c.to_bytes(pt)))
            assert back == pt


def test_fr_vector_and_u64_layout():
    """Vec<Fr>: u64 LE length + fixed-width little-endian canonical words."""
    from ckb_zkp_tpu.serialize.ark_schemes import FR, Vec, ark_encode

    curve = get_curve("bn254")
    r = curve.fr.modulus
    vals = [0, 1, 2, r - 1, 0xDEADBEEF]
    got = ark_encode(curve, vals, Vec(FR))
    want = len(vals).to_bytes(8, "little") + b"".join(
        (v % r).to_bytes(32, "little") for v in vals
    )
    assert got == want


def test_groth16_vk_layout_matches_independent_rules():
    """Full vk: alpha_g1 || beta_g2 || gamma_g2 || delta_g2 || u64 len ||
    gamma_abc_g1[..] — assembled with the independent encoder."""
    import random

    from ckb_zkp_tpu.circuits import Mini
    from ckb_zkp_tpu.schemes import groth16
    from ckb_zkp_tpu.schemes.groth16 import serialize as g16ser

    curve = get_curve("bn254")
    params = groth16.generate_random_parameters(
        Mini.power_off(), curve, random.Random(1)
    )
    vk = params.vk
    got = g16ser.vk_to_bytes(curve, vk)
    want = (
        ref_g1_bytes(curve, vk.alpha_g1)
        + ref_g2_bytes(curve, vk.beta_g2)
        + ref_g2_bytes(curve, vk.gamma_g2)
        + ref_g2_bytes(curve, vk.delta_g2)
        + len(vk.gamma_abc_g1).to_bytes(8, "little")
        + b"".join(ref_g1_bytes(curve, pt) for pt in vk.gamma_abc_g1)
    )
    assert got == want
