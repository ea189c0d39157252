"""Gadget library tests (mirrors gadget unit tests in the reference)."""

import random

import pytest

from ckb_zkp_tpu.gadgets import (
    AllocatedBit,
    AllocatedFr,
    Boolean,
    TestConstraintSystem,
    enforce_greater_than,
    mimc,
)
from ckb_zkp_tpu.gadgets.boolean import field_into_allocated_bits_le
from ckb_zkp_tpu.host.pairing import get_curve

RNG = random.Random(1234)


@pytest.fixture(scope="module")
def fr():
    return get_curve("bls12_381").fr


def test_mimc_gadget_matches_native(fr):
    """mimc.rs test: gadget output == native hash, 644 constraints."""
    for _ in range(3):
        data = bytes(RNG.randrange(256) for _ in range(100))
        native = mimc.hash_bytes(fr, data)
        cs = TestConstraintSystem(fr.modulus)
        with cs.ns("mimc hash"):
            image = mimc.mimc_gadget(cs, fr, data)
        assert image == native
        assert cs.is_satisfied()
        assert cs.num_constraints == 644


def test_mimc_gadget_detects_bad_witness(fr):
    data = b"hello world, mimc"
    cs = TestConstraintSystem(fr.modulus)
    mimc.mimc_gadget(cs, fr, data)
    assert cs.is_satisfied()
    # corrupt one aux assignment
    cs.aux_values[5] = (cs.aux_values[5] + 1) % fr.modulus
    assert not cs.is_satisfied()
    assert cs.which_is_unsatisfied() is not None


@pytest.mark.parametrize(
    "op,table",
    [
        ("xor", [(0, 0, 0), (0, 1, 1), (1, 0, 1), (1, 1, 0)]),
        ("and_", [(0, 0, 0), (0, 1, 0), (1, 0, 0), (1, 1, 1)]),
        ("and_not", [(0, 0, 0), (0, 1, 0), (1, 0, 1), (1, 1, 0)]),
        ("nor", [(0, 0, 1), (0, 1, 0), (1, 0, 0), (1, 1, 0)]),
    ],
)
def test_allocated_bit_ops(fr, op, table):
    for a_v, b_v, expect in table:
        cs = TestConstraintSystem(fr.modulus)
        a = AllocatedBit.alloc(cs, a_v)
        b = AllocatedBit.alloc(cs, b_v)
        out = getattr(AllocatedBit, op)(cs, a, b)
        assert out.value == expect
        assert cs.is_satisfied()


def test_boolean_not_and_xor(fr):
    cs = TestConstraintSystem(fr.modulus)
    a = Boolean.from_bit(AllocatedBit.alloc(cs, 1))
    b = Boolean.from_bit(AllocatedBit.alloc(cs, 0))
    assert Boolean.xor(cs, a, b).get_value() == 1
    assert Boolean.and_(cs, a, b.not_()).get_value() == 1
    assert Boolean.xor(cs, a, Boolean.true()).get_value() == 0
    assert cs.is_satisfied()


def test_field_bits_roundtrip(fr):
    cs = TestConstraintSystem(fr.modulus)
    v = RNG.randrange(fr.modulus)
    bits = field_into_allocated_bits_le(cs, fr.modulus, v)
    assert cs.is_satisfied()
    recon = sum(b.value << i for i, b in enumerate(bits))
    assert recon == v


def test_rangeproof(fr):
    cs = TestConstraintSystem(fr.modulus)
    enforce_greater_than(cs, fr.modulus, 25, 24)
    assert cs.is_satisfied()
    cs2 = TestConstraintSystem(fr.modulus)
    enforce_greater_than(cs2, fr.modulus, 24, 25)
    assert not cs2.is_satisfied()


def test_allocated_fr(fr):
    p = fr.modulus
    cs = TestConstraintSystem(p)
    a = AllocatedFr.alloc(cs, 7)
    b = AllocatedFr.alloc(cs, 6)
    c = a.mul(cs, b, p)
    assert c.value == 42
    a.inputize(cs)
    a.assert_nonzero(cs, p)
    assert cs.is_satisfied()


def test_tcs_set_get_and_hash(fr):
    p = fr.modulus
    cs = TestConstraintSystem(p)
    with cs.ns("grp"):
        v = cs.alloc("x", 5)
    assert cs.get("grp/x") == 5
    cs.set("grp/x", 9)
    assert cs.get("grp/x") == 9
    h1 = cs.hash()
    cs.enforce("extra", v, v, v)
    assert cs.hash() != h1


# ---- UInt32 / MultiEq / SHA256 / BLAKE2s (uint32.rs, sha256.rs, blake2s.rs) ----

from ckb_zkp_tpu.gadgets import MultiEq, UInt32  # noqa: E402
from ckb_zkp_tpu.gadgets import blake2s as blake2s_mod  # noqa: E402
from ckb_zkp_tpu.gadgets import sha256 as sha256_mod  # noqa: E402
from ckb_zkp_tpu.gadgets.boolean import sha256_ch, sha256_maj  # noqa: E402


def test_boolean_sha256_ch_maj(fr):
    for a_v in (0, 1):
        for b_v in (0, 1):
            for c_v in (0, 1):
                cs = TestConstraintSystem(fr.modulus)
                a = Boolean.from_bit(AllocatedBit.alloc(cs, a_v))
                b = Boolean.from_bit(AllocatedBit.alloc(cs, b_v))
                c = Boolean.from_bit(AllocatedBit.alloc(cs, c_v))
                ch = sha256_ch(cs, a, b, c)
                maj = sha256_maj(cs, a, b, c)
                assert ch.get_value() == (a_v & b_v) ^ ((1 - a_v) & c_v)
                assert maj.get_value() == (a_v & b_v) ^ (a_v & c_v) ^ (b_v & c_v)
                assert cs.is_satisfied()


def test_uint32_ops(fr):
    p = fr.modulus
    for _ in range(10):
        a_v, b_v, c_v, d_v = (RNG.getrandbits(32) for _ in range(4))
        cs = TestConstraintSystem(p)
        a = UInt32.alloc(cs, a_v)
        b = UInt32.constant(b_v)
        c = UInt32.constant(c_v)
        d = UInt32.alloc(cs, d_v)
        r = a.xor(cs, b)
        assert r.value == a_v ^ b_v
        with MultiEq(cs, p) as meq:
            s = UInt32.addmany(meq, [r, c, d])
        assert s.value == (a_v ^ b_v) + c_v + d_v & 0xFFFFFFFF
        assert cs.is_satisfied()
        # rotr / shr are free (no constraints) and correct
        for by in (0, 1, 7, 31):
            assert a.rotr(by).value == ((a_v >> by) | (a_v << (32 - by))) & 0xFFFFFFFF
            assert a.shr(by).value == a_v >> by
        # tamper: flip a result bit -> unsatisfied
        bit_var = s.bits[0].bit.variable
        cs.aux_values[bit_var.index] ^= 1
        assert not cs.is_satisfied()


def test_uint32_sha256_triops(fr):
    p = fr.modulus
    a_v, b_v, c_v = (RNG.getrandbits(32) for _ in range(3))
    cs = TestConstraintSystem(p)
    a = UInt32.alloc(cs, a_v)
    b = UInt32.alloc(cs, b_v)
    c = UInt32.constant(c_v)
    maj = UInt32.sha256_maj(cs, a, b, c)
    ch = UInt32.sha256_ch(cs, a, b, c)
    assert maj.value == (a_v & b_v) ^ (a_v & c_v) ^ (b_v & c_v)
    assert ch.value == (a_v & b_v) ^ (~a_v & c_v) & 0xFFFFFFFF
    assert cs.is_satisfied()


def test_sha256_gadget_matches_hashlib(fr):
    p = fr.modulus
    data = bytes(RNG.randrange(256) for _ in range(32))
    cs = TestConstraintSystem(p)
    in_bits = [
        Boolean.from_bit(AllocatedBit.alloc(cs, int(v)))
        for v in sha256_mod.bytes_to_bits_be(data)
    ]
    out = sha256_mod.sha256(cs, p, in_bits)
    assert cs.is_satisfied()
    assert sha256_mod.bits_to_bytes_be(out) == sha256_mod.sha256_native(data)


def _sha256_compress_native(block: bytes, state: list[int]) -> list[int]:
    """Plain-python SHA256 compression for cross-checking the gadget."""
    M32 = 0xFFFFFFFF
    rotr = lambda x, n: ((x >> n) | (x << (32 - n))) & M32
    w = [int.from_bytes(block[i : i + 4], "big") for i in range(0, 64, 4)]
    for i in range(16, 64):
        s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> 10)
        w.append((w[i - 16] + s0 + w[i - 7] + s1) & M32)
    a, b, c, d, e, f, g, h = state
    for i in range(64):
        s1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25)
        ch = (e & f) ^ (~e & g & M32)
        t1 = (h + s1 + ch + sha256_mod.ROUND_CONSTANTS[i] + w[i]) & M32
        s0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = (s0 + maj) & M32
        h, g, f, e, d, c, b, a = g, f, e, (d + t1) & M32, c, b, a, (t1 + t2) & M32
    return [(x + y) & M32 for x, y in zip(state, [a, b, c, d, e, f, g, h])]


def test_sha256_block_no_padding(fr):
    p = fr.modulus
    data = bytes(RNG.randrange(256) for _ in range(64))
    cs = TestConstraintSystem(p)
    in_bits = [
        Boolean.from_bit(AllocatedBit.alloc(cs, int(v)))
        for v in sha256_mod.bytes_to_bits_be(data)
    ]
    out = sha256_mod.sha256_block_no_padding(cs, p, in_bits)
    assert cs.is_satisfied()
    expect = b"".join(
        x.to_bytes(4, "big") for x in _sha256_compress_native(data, list(sha256_mod.IV))
    )
    assert sha256_mod.bits_to_bytes_be(out) == expect


def test_blake2s_gadget_matches_hashlib(fr):
    p = fr.modulus
    for n, person in ((0, b"12345678"), (32, bytes(8)), (70, b"ZcashPrf")):
        data = bytes(RNG.randrange(256) for _ in range(n))
        cs = TestConstraintSystem(p)
        in_bits = [
            Boolean.from_bit(AllocatedBit.alloc(cs, int(v)))
            for v in blake2s_mod.bytes_to_bits_le(data)
        ]
        out = blake2s_mod.blake2s(cs, p, in_bits, person)
        assert cs.is_satisfied()
        assert blake2s_mod.bits_to_bytes_le(out) == blake2s_mod.blake2s_native(data, person)


def test_blake2s_blank_hash_is_free(fr):
    p = fr.modulus
    cs = TestConstraintSystem(p)
    out = blake2s_mod.blake2s(cs, p, [], b"12345678")
    assert cs.is_satisfied()
    assert cs.num_constraints == 0  # all-constant inputs: zero constraints
    assert blake2s_mod.bits_to_bytes_le(out) == blake2s_mod.blake2s_native(b"", b"12345678")


# ---- Poseidon / Rescue / lookup / CBMT (poseidon.rs, rescue.rs, table.rs, cbmt.rs) ----

from ckb_zkp_tpu.gadgets import cbmt, lookup, poseidon, rescue  # noqa: E402


def test_poseidon_gadget_matches_native(fr):
    data = bytes(RNG.randrange(256) for _ in range(100))
    native = poseidon.hash_bytes(fr, data)
    cs = TestConstraintSystem(fr.modulus)
    image, var = poseidon.poseidon_gadget(cs, fr, data)
    assert image == native
    assert cs.is_satisfied()
    # 107 S-boxes x 3 + output binding
    assert cs.num_constraints == 107 * 3 + 1
    # tamper with the witness -> unsatisfied
    cs.aux_values[3] = (cs.aux_values[3] + 1) % fr.modulus
    assert not cs.is_satisfied()


def test_rescue_gadget_matches_native(fr):
    data = bytes(RNG.randrange(256) for _ in range(64))
    native = rescue.hash_bytes(fr, data)
    cs = TestConstraintSystem(fr.modulus)
    image, var = rescue.rescue_gadget(cs, fr, data)
    assert image == native
    assert cs.is_satisfied()
    assert cs.num_constraints == 44 * 3 * 3 + 1
    cs.aux_values[4] = (cs.aux_values[4] + 1) % fr.modulus
    assert not cs.is_satisfied()


def test_rescue_alpha_inverse(fr):
    rc = rescue.constants(fr)
    x = RNG.randrange(1, fr.modulus)
    assert pow(pow(x, rescue.ALPHA, fr.modulus), rc.invalpha, fr.modulus) == x


def test_lookup_gadgets(fr):
    p = fr.modulus
    c2 = [RNG.randrange(p) for _ in range(4)]
    c8 = [RNG.randrange(p) for _ in range(8)]
    cxy = [(RNG.randrange(p), RNG.randrange(p)) for _ in range(8)]
    for idx in range(8):
        bits_v = [(idx >> k) & 1 for k in range(3)]
        cs = TestConstraintSystem(p)
        bits = [Boolean.from_bit(AllocatedBit.alloc(cs, v)) for v in bits_v]
        if idx < 2:
            r1 = lookup.lookup1_x(cs, bits[0], c2[:2])
            assert r1.value == c2[idx & 1]
        if idx < 4:
            r2 = lookup.lookup2_x(cs, bits[:2], c2)
            assert r2.value == c2[idx & 3]
        r3 = lookup.lookup3_x(cs, bits, c8, p)
        assert r3.value == c8[idx]
        rx, ry = lookup.lookup3_xy(cs, bits, cxy, p)
        assert (rx.value, ry.value) == cxy[idx]
        assert cs.is_satisfied()


def test_lookup_synth_inclusion_exclusion(fr):
    p = fr.modulus
    consts = [RNG.randrange(p) for _ in range(8)]
    coeffs = lookup.synth(3, consts, p)
    for i in range(8):
        # sum of coeffs over submasks of i == consts[i]
        acc = sum(coeffs[m] for m in range(8) if m & i == m) % p
        assert acc == consts[i]


def test_cbmt_native_reference_vectors(fr):
    """cbmt.rs tests:253-338 with the i32 wrapping-sub merge."""
    def merge_i32(l, r):  # wrapping i32 subtraction
        v = (r - l) & 0xFFFFFFFF
        return v - (1 << 32) if v >= 1 << 31 else v

    tree = cbmt.build_merkle_tree([2, 3, 5, 7, 11], merge_i32)
    assert tree.nodes == [4, -2, 2, 4, 2, 3, 5, 7, 11]
    assert cbmt.build_merkle_root([2, 3, 5, 7, 11], merge_i32) == 4
    proof = cbmt.build_merkle_proof([2, 3, 5, 7, 11, 13], 5, merge_i32)
    assert proof.lemmas == [11, 2, 1]
    assert proof.root(13) == 1
    single = cbmt.build_merkle_proof([2], 0, merge_i32)
    assert single.lemmas == []
    assert single.root(2) == 2
    # rebuild-proof path (cbmt.rs:301-317)
    tree2 = cbmt.build_merkle_tree([2, 3, 5, 7, 11], merge_i32)
    pf = tree2.build_proof(3)
    leaf = tree2.nodes[pf.index]
    assert cbmt.MerkleProof(pf.index, list(pf.lemmas), merge_i32).verify(tree2.root(), leaf)


def test_cbmt_merkle_gadget_mimc(fr):
    """cbmt_constraints.rs test_merkle_tree_mimc, 7 leaves."""
    p = fr.modulus

    def merge_mimc(left, right):
        data = int(left).to_bytes(fr.nbytes, "little") + int(right).to_bytes(
            fr.nbytes, "little"
        )
        return mimc.hash_bytes(fr, data)

    leaves = [1, 2, 3, 4, 5, 6, 7]
    tree = cbmt.build_merkle_tree(leaves, merge_mimc)
    root = tree.root()
    cs = TestConstraintSystem(p)
    hasher = mimc.AbstractHashMimc(fr)
    n_root = mimc.AbstractHashMimcOutput.alloc(cs, root)
    for i, leaf in enumerate(leaves):
        proof = tree.build_proof(i)
        assert proof.verify(root, leaf)
        n_leaf = mimc.AbstractHashMimcOutput.alloc(cs, leaf)
        lemmas = [mimc.AbstractHashMimcOutput.alloc(cs, v) for v in proof.lemmas]
        g = cbmt.MerkleProofGadget(proof.index, lemmas, hasher)
        with cs.ns(f"set_membership_{i}"):
            g.set_membership(cs, n_root, n_leaf)
    assert cs.is_satisfied()
