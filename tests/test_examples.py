"""Executable gadget examples (parity: /root/reference/gadgets/examples/
rescue_groth16.rs, rescue_spartan.rs, poseidon.rs, merkle_tree_mimc.rs) —
gadget circuits proven end-to-end through real schemes."""

import random

import pytest

from ckb_zkp_tpu.gadgets import cbmt, mimc, poseidon, rescue
from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.r1cs import ONE, ConstraintSystem, SynthesisMode
from ckb_zkp_tpu.schemes import groth16
from ckb_zkp_tpu.schemes.spartan import nizk


@pytest.fixture(scope="module")
def curve():
    return get_curve("bn254")


class _HashPreimage:
    """Prove knowledge of a sponge preimage whose image is public."""

    def __init__(self, spec, gadget, data: bytes | None):
        self.spec = spec
        self.gadget = gadget
        self.data = data

    def generate_constraints(self, cs: ConstraintSystem) -> None:
        image_value, image_var = self.gadget(cs, self.spec, self.data)
        pub = cs.alloc_input("image", image_value)
        cs.enforce("image is public", image_var, ONE, pub)


def test_rescue_groth16(curve):
    """rescue_groth16.rs — groth16 over the rescue gadget."""
    rng = random.Random(5)
    data = b"hello rescue, tpu prover"
    image = rescue.hash_bytes(curve.fr, data)
    params = groth16.generate_random_parameters(
        _HashPreimage(curve.fr, rescue.rescue_gadget, None), curve, rng
    )
    proof = groth16.create_random_proof(
        params, _HashPreimage(curve.fr, rescue.rescue_gadget, data), rng
    )
    pvk = groth16.prepare_verifying_key(curve, params.vk)
    assert groth16.verify_proof(curve, pvk, proof, [image])
    assert not groth16.verify_proof(curve, pvk, proof, [(image + 1) % curve.fr.modulus])


def test_rescue_spartan(curve):
    """rescue_spartan.rs — spartan nizk over the rescue gadget."""
    rng = random.Random(6)
    data = b"hello rescue, spartan"
    image = rescue.hash_bytes(curve.fr, data)
    r1cs = nizk.generate_r1cs(curve, _HashPreimage(curve.fr, rescue.rescue_gadget, None))
    params = nizk.generate_setup_parameters(curve, rng, r1cs.num_aux, r1cs.num_inputs)
    h1, h2 = r1cs.r1cs_to_hash(), nizk.params_to_hash(curve, params)
    proof = nizk.create_nizk_proof(
        curve, params, r1cs, _HashPreimage(curve.fr, rescue.rescue_gadget, data),
        h1, h2, rng,
    )
    assert nizk.verify_nizk_proof(curve, params, r1cs, [image], proof, h1, h2)
    assert not nizk.verify_nizk_proof(curve, params, r1cs, [image + 1], proof, h1, h2)


def test_poseidon_spartan(curve):
    """poseidon.rs example — proven through spartan nizk."""
    rng = random.Random(9)
    data = b"hello poseidon"
    image = poseidon.hash_bytes(curve.fr, data)
    mk = lambda d: _HashPreimage(curve.fr, poseidon.poseidon_gadget, d)  # noqa: E731
    r1cs = nizk.generate_r1cs(curve, mk(None))
    params = nizk.generate_setup_parameters(curve, rng, r1cs.num_aux, r1cs.num_inputs)
    h1, h2 = r1cs.r1cs_to_hash(), nizk.params_to_hash(curve, params)
    proof = nizk.create_nizk_proof(curve, params, r1cs, mk(data), h1, h2, rng)
    assert nizk.verify_nizk_proof(curve, params, r1cs, [image], proof, h1, h2)


class _MerkleMembership:
    """merkle_tree_mimc.rs — in-circuit CBMT membership under MiMC."""

    def __init__(self, spec, index: int, leaves: list[int] | None):
        self.spec = spec
        self.index = index
        self.leaves = leaves

    def generate_constraints(self, cs: ConstraintSystem) -> None:
        spec = self.spec

        def merge(left, right):
            data = int(left).to_bytes(spec.nbytes, "little") + int(right).to_bytes(
                spec.nbytes, "little"
            )
            return mimc.hash_bytes(spec, data)

        hasher = mimc.AbstractHashMimc(spec)
        if self.leaves is not None:
            tree = cbmt.build_merkle_tree(self.leaves, merge)
            proof = tree.build_proof(self.index)
            root = tree.root()
            leaf = self.leaves[self.index]
            lemmas = proof.lemmas
            tree_index = proof.index
        else:
            # setup shape: a 4-leaf tree always yields 2 lemmas
            root = leaf = None
            lemmas = [None, None]
            tree_index = 3 + self.index  # leaves_count=4 -> internal index
        n_root = mimc.AbstractHashMimcOutput.alloc_input(cs, root)
        n_leaf = mimc.AbstractHashMimcOutput.alloc(cs, leaf)
        lemma_outs = [mimc.AbstractHashMimcOutput.alloc(cs, v) for v in lemmas]
        g = cbmt.MerkleProofGadget(tree_index, lemma_outs, hasher)
        g.set_membership(cs, n_root, n_leaf)


class _Sha256Membership:
    """merkle_tree_sha256.rs — in-circuit CBMT membership under the full
    sha256 gadget (reference: gadgets/examples/merkle_tree_sha256.rs).
    Leaves are 32-byte values; merge = sha256(left || right)."""

    def __init__(self, p: int, index: int, leaves: list[bytes] | None,
                 n_lemmas: int = 1):
        self.p = p
        self.index = index
        self.leaves = leaves
        self.n_lemmas = n_lemmas

    def generate_constraints(self, cs: ConstraintSystem) -> None:
        from ckb_zkp_tpu.gadgets import sha256 as sh

        hasher = sh.AbstractHashSha256(self.p)
        if self.leaves is not None:
            def merge(left, right):
                return sh.sha256_native(left + right)

            tree = cbmt.build_merkle_tree(self.leaves, merge)
            proof = tree.build_proof(self.index)
            root, leaf = tree.root(), self.leaves[self.index]
            lemmas, tree_index = proof.lemmas, proof.index
        else:
            root = leaf = None
            lemmas = [None] * self.n_lemmas
            tree_index = (1 << self.n_lemmas) - 1 + self.index
        n_root = sh.AbstractHashSha256Output.alloc_input(cs, root)
        n_leaf = sh.AbstractHashSha256Output.alloc(cs, leaf)
        lemma_outs = [
            sh.AbstractHashSha256Output.alloc(cs, v) for v in lemmas
        ]
        g = cbmt.MerkleProofGadget(tree_index, lemma_outs, hasher)
        g.set_membership(cs, n_root, n_leaf)


def test_merkle_tree_sha256_satisfied(curve):
    """Cheap tier: TestConstraintSystem satisfaction + root binding."""
    from ckb_zkp_tpu.gadgets.test_constraint_system import TestConstraintSystem

    p = curve.fr.modulus
    leaves = [bytes([i + 1]) * 32 for i in range(2)]
    cs = TestConstraintSystem(p)
    _Sha256Membership(p, 0, leaves).generate_constraints(cs)
    assert cs.is_satisfied()


@pytest.mark.slow
def test_merkle_tree_sha256_groth16(curve):
    """merkle_tree_sha256.rs e2e — groth16 proof of sha256-CBMT membership
    (2-leaf tree, ~45k constraints; multi-minute on CPU)."""
    rng = random.Random(13)
    p = curve.fr.modulus
    leaves = [bytes([i + 1]) * 32 for i in range(2)]
    from ckb_zkp_tpu.gadgets import sha256 as sh

    def merge(left, right):
        return sh.sha256_native(left + right)

    tree = cbmt.build_merkle_tree(leaves, merge)
    root = tree.root()
    params = groth16.generate_random_parameters(
        _Sha256Membership(p, 0, None), curve, rng
    )
    proof = groth16.create_random_proof(
        params, _Sha256Membership(p, 0, leaves), rng
    )
    pvk = groth16.prepare_verifying_key(curve, params.vk)
    from ckb_zkp_tpu.gadgets.sha256 import bytes_to_bits_be

    root_inputs = [1 if b else 0 for b in bytes_to_bits_be(root)]
    assert groth16.verify_proof(curve, pvk, proof, root_inputs)
    bad = list(root_inputs)
    bad[0] = 1 - bad[0]
    assert not groth16.verify_proof(curve, pvk, proof, bad)


def test_merkle_tree_mimc_groth16(curve):
    """merkle_tree_mimc.rs — groth16 proof of CBMT membership."""
    rng = random.Random(11)
    spec = curve.fr
    leaves = [10, 20, 30, 40]
    index = 2

    def merge(left, right):
        data = int(left).to_bytes(spec.nbytes, "little") + int(right).to_bytes(
            spec.nbytes, "little"
        )
        return mimc.hash_bytes(spec, data)

    root = cbmt.build_merkle_tree(leaves, merge).root()
    params = groth16.generate_random_parameters(
        _MerkleMembership(spec, index, None), curve, rng
    )
    proof = groth16.create_random_proof(
        params, _MerkleMembership(spec, index, leaves), rng
    )
    pvk = groth16.prepare_verifying_key(curve, params.vk)
    assert groth16.verify_proof(curve, pvk, proof, [root])
    assert not groth16.verify_proof(curve, pvk, proof, [(root + 1) % spec.modulus])
