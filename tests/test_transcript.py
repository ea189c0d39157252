"""Transcript layer: keccak vs hashlib, merlin vector, ChaCha20 RFC vector."""

import hashlib

from ckb_zkp_tpu.transcript import Transcript, chacha20_block, sha3_256


def test_keccak_via_sha3():
    for msg in [b"", b"abc", b"x" * 200, bytes(range(256))]:
        assert sha3_256(msg) == hashlib.sha3_256(msg).digest()


def test_merlin_known_vector():
    """The `equivalence_simple` vector from merlin's own test suite."""
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    challenge = t.challenge_bytes(b"challenge", 32)
    assert (
        challenge.hex()
        == "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"
    )


def test_merlin_determinism_and_sensitivity():
    a = Transcript(b"proto")
    b = Transcript(b"proto")
    a.append_message(b"l", b"m")
    b.append_message(b"l", b"m")
    assert a.challenge_bytes(b"c", 16) == b.challenge_bytes(b"c", 16)
    c = Transcript(b"proto")
    c.append_message(b"l", b"n")
    assert c.challenge_bytes(b"c", 16) != a.challenge_bytes(b"c", 16)


def test_chacha20_rfc8439_vector():
    key = bytes(range(32))
    nonce = bytes.fromhex("000000090000004a00000000")
    block = chacha20_block(key, 1, nonce)
    assert block[:16] == bytes.fromhex("10f1e7e4d13b5915500fdd1fa32071c4")
