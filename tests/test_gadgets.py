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
