"""Spartan NIZK end-to-end (mirrors /root/reference/spartan/tests/mini.rs)."""

import random

import pytest

from ckb_zkp_tpu.circuits import Mini
from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.schemes.spartan import nizk
from ckb_zkp_tpu.schemes.spartan.polynomial import eval_eq, evaluate_mle


@pytest.fixture(scope="module")
def curve():
    return get_curve("bn254")


def test_eval_eq_sums_to_one(curve):
    p = curve.fr.modulus
    rng = random.Random(3)
    r = [rng.randrange(p) for _ in range(4)]
    table = eval_eq(r, p)
    assert sum(table) % p == 1


def test_spartan_nizk_mini(curve):
    rng = random.Random(55)
    r1cs = nizk.generate_r1cs(curve, Mini.power_off())
    params = nizk.generate_setup_parameters(
        curve, rng, r1cs.num_aux, r1cs.num_inputs
    )
    r1cs_hash = r1cs.r1cs_to_hash()
    params_hash = nizk.params_to_hash(curve, params)
    proof = nizk.create_nizk_proof(
        curve, params, r1cs, Mini.power_on(2, 3, 10), r1cs_hash, params_hash, rng
    )
    assert nizk.verify_nizk_proof(
        curve, params, r1cs, [10], proof, r1cs_hash, params_hash
    )
    assert not nizk.verify_nizk_proof(
        curve, params, r1cs, [11], proof, r1cs_hash, params_hash
    )


# ---- SNARK / SPARK (spark.rs, prover.rs:1062+, verify.rs:538+) ----

from ckb_zkp_tpu.schemes.spartan import snark


def test_spark_encode_memory_consistency(curve):
    p = curve.fr.modulus
    r1cs = nizk.generate_r1cs(curve, Mini.power_off())
    rng = random.Random(7)
    params = snark.generate_setup_snark_parameters(
        curve, rng, r1cs.num_aux, r1cs.num_inputs, r1cs.num_constraints
    )
    enc, commit = snark.encode(params, r1cs, rng)
    # init * write == read * audit for a random gamma (checked inside)
    rows = [rng.randrange(p) for _ in range((commit.m).bit_length() - 1)]
    cols = [rng.randrange(p) for _ in range((commit.m).bit_length() - 1)]
    mem_row = eval_eq(rows, p)
    mem_col = eval_eq(cols, p)
    e_row = [[mem_row[a] for a in addrs] for addrs in enc.row_addr_ts.addr_index]
    e_col = [[mem_col[a] for a in addrs] for addrs in enc.col_addr_ts.addr_index]
    gamma = (rng.randrange(p), rng.randrange(p))
    snark.circuit_eval_opt(enc, gamma, (e_row, e_col), (mem_row, mem_col), p)


def test_spark_dotp_equals_mle(curve):
    """e_row·e_col·val per matrix == the matrix MLE at (rx, ry)."""
    p = curve.fr.modulus
    r1cs = nizk.generate_r1cs(curve, Mini.power_off())
    rng = random.Random(8)
    params = snark.generate_setup_snark_parameters(
        curve, rng, r1cs.num_aux, r1cs.num_inputs, r1cs.num_constraints
    )
    enc, commit = snark.encode(params, r1cs, rng)
    num_x = r1cs.num_constraints.bit_length() - 1
    t = max(r1cs.num_aux, r1cs.num_inputs)
    t = 1 << (t - 1).bit_length()
    num_y = t.bit_length()  # log2(2t)
    rx = [rng.randrange(p) for _ in range(num_x)]
    ry = [rng.randrange(p) for _ in range(num_y)]
    rows, cols = snark.equalize_length(rx, ry)
    mem_row = eval_eq(rows, p)
    mem_col = eval_eq(cols, p)
    for i, (mat, name) in enumerate(
        [(r1cs.a_matrix, "a"), (r1cs.b_matrix, "b"), (r1cs.c_matrix, "c")]
    ):
        e_row = [mem_row[a] for a in enc.row_addr_ts.addr_index[i]]
        e_col = [mem_col[a] for a in enc.col_addr_ts.addr_index[i]]
        dotp = snark.evaluate_dot_product_circuit(e_row, e_col, enc.val_list[i], p)
        assert dotp == evaluate_mle(mat, rx, ry, p), name


def test_spartan_snark_mini(curve):
    rng = random.Random(99)
    setup = snark.generate_random_parameters(curve, Mini.power_off(), rng)
    r1cs_hash = setup.r1cs.r1cs_to_hash()
    params_hash = snark.snark_params_to_hash(curve, setup.params)
    encode_hash = snark.encode_to_hash(curve, setup.encode_commit)
    proof = snark.create_snark_proof(
        curve, setup.params, setup.r1cs, Mini.power_on(2, 3, 10),
        setup.encode, setup.encode_commit,
        r1cs_hash, params_hash, encode_hash, rng,
    )
    assert snark.verify_snark_proof(
        curve, setup.params, setup.r1cs, [10], proof, setup.encode_commit,
        r1cs_hash, params_hash, encode_hash,
    )
    assert not snark.verify_snark_proof(
        curve, setup.params, setup.r1cs, [11], proof, setup.encode_commit,
        r1cs_hash, params_hash, encode_hash,
    )
    # tampered matrix eval claim must fail the dot-product split check
    bad = snark.SNARKProof(
        proof.r1cs_satisfied_proof,
        ((proof.matrix_evals[0] + 1) % curve.fr.modulus,
         proof.matrix_evals[1], proof.matrix_evals[2]),
        proof.r1cs_evals_proof,
    )
    assert not snark.verify_snark_proof(
        curve, setup.params, setup.r1cs, [10], bad, setup.encode_commit,
        r1cs_hash, params_hash, encode_hash,
    )


# ---- device-resident sumcheck tables (ops/sumcheck.py) ----


def test_device_sumcheck_matches_host(curve):
    from ckb_zkp_tpu.ops import sumcheck as dsum
    from ckb_zkp_tpu.schemes.spartan.polynomial import combine_with_n, combine_with_r

    p = curve.fr.modulus
    rng = random.Random(17)
    n = 16
    pa, pb, pc, peq = ([rng.randrange(p) for _ in range(n)] for _ in range(4))
    d = dsum.DeviceSumcheck(curve.fr)
    da, db, dc, de = (d.encode_table(v) for v in (pa, pb, pc, peq))
    e0, e2, e3 = d.cubic_round(da, db, dc, de)
    size = n // 2

    def host_eval(a, b, c, e):
        return sum(e[j] * ((a[j] * b[j] - c[j]) % p) % p for j in range(size)) % p

    assert e0 == host_eval(pa, pb, pc, peq)
    k2 = [combine_with_n(v, 2, p) for v in (pa, pb, pc, peq)]
    assert e2 == host_eval(*k2)
    k3 = [combine_with_n(v, 3, p) for v in (pa, pb, pc, peq)]
    assert e3 == host_eval(*k3)
    r = rng.randrange(p)
    bound = d.bind(da, r)
    assert curve.fr.modulus and d.fr.decode(bound) == combine_with_r(pa, r, p)
    q0, q2 = d.quad_round(da, db)
    assert q0 == sum(pa[j] * pb[j] % p for j in range(size)) % p


def test_spartan_nizk_device_sumcheck_path(curve, monkeypatch):
    """Force the device threshold down so the proof runs the device tables."""
    from ckb_zkp_tpu.ops import sumcheck as dsum

    monkeypatch.setattr(dsum, "DEVICE_SUMCHECK_MIN", 2)
    rng = random.Random(55)
    r1cs = nizk.generate_r1cs(curve, Mini.power_off())
    params = nizk.generate_setup_parameters(curve, rng, r1cs.num_aux, r1cs.num_inputs)
    h1, h2 = r1cs.r1cs_to_hash(), nizk.params_to_hash(curve, params)
    proof = nizk.create_nizk_proof(
        curve, params, r1cs, Mini.power_on(2, 3, 10), h1, h2, rng
    )
    assert nizk.verify_nizk_proof(curve, params, r1cs, [10], proof, h1, h2)


def test_spartan_snark_spark_device_sumcheck_matches_host(curve, monkeypatch):
    """SPARK batched cubic sumcheck (product/hash layers) on device tables
    produces the byte-identical proof to the host-int path (VERDICT r4
    item 6; reference: spartan/src/prover.rs:1442-1607)."""
    from ckb_zkp_tpu.ops import sumcheck as dsum
    from ckb_zkp_tpu.serialize.ark_schemes import ark_encode

    def run():
        rng = random.Random(99)
        setup = snark.generate_random_parameters(curve, Mini.power_off(), rng)
        r1cs_hash = setup.r1cs.r1cs_to_hash()
        params_hash = snark.snark_params_to_hash(curve, setup.params)
        encode_hash = snark.encode_to_hash(curve, setup.encode_commit)
        proof = snark.create_snark_proof(
            curve, setup.params, setup.r1cs, Mini.power_on(2, 3, 10),
            setup.encode, setup.encode_commit,
            r1cs_hash, params_hash, encode_hash, rng,
        )
        ok = snark.verify_snark_proof(
            curve, setup.params, setup.r1cs, [10], proof, setup.encode_commit,
            r1cs_hash, params_hash, encode_hash,
        )
        return ok, ark_encode(curve, proof)

    ok_host, host_bytes = run()
    monkeypatch.setattr(dsum, "DEVICE_SUMCHECK_MIN", 2)
    ok_dev, dev_bytes = run()
    assert ok_host and ok_dev
    assert host_bytes == dev_bytes


def test_poly_commit_vec_device_path_matches_host(curve, monkeypatch):
    from ckb_zkp_tpu.schemes.spartan import common

    rng = random.Random(4)
    p = curve.fr.modulus
    gens = [curve.g1.mul(curve.g1_gen, rng.randrange(1, p)) for _ in range(16)]
    h = curve.g1.mul(curve.g1_gen, 777)
    values = [rng.randrange(p) for _ in range(16)]
    host_commit = common.poly_commit_vec(curve, gens, values, h, 9)
    from ckb_zkp_tpu.ops import msm as msm_mod

    monkeypatch.setattr(msm_mod, "FIXED_BASE_MSM_MIN", 2)
    dev_commit = common.poly_commit_vec(curve, gens, values, h, 9)
    assert host_commit == dev_commit
