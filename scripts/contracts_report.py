"""Per-scheme portable-verifier cost report — the framework's analogue of
the reference's on-chain cycles/size table (ckb-contracts/bench-tests/
src/tests.rs:782-799, README.md:304-312).

For each contract entry point: proves the reference's mini fixture
off-chain, builds the ark-0.2 cells, then reports cell byte sizes and
verifier wall-clock (median of N runs, host CPU — the portable verifier is
the CKB-VM contract's equivalent surface). Writes CONTRACTS_r03.json.

Usage: python scripts/contracts_report.py [out.json]
"""

import json
import os
import random
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from ckb_zkp_tpu import contracts  # noqa: E402
from ckb_zkp_tpu.circuits import Mini  # noqa: E402
from ckb_zkp_tpu.host.pairing import get_curve  # noqa: E402
from ckb_zkp_tpu.serialize.ark_schemes import (  # noqa: E402
    FR,
    S,
    Tup,
    Vec,
    ark_encode,
)
from ckb_zkp_tpu.serialize.tobytes import fr_bytes  # noqa: E402

REPS = int(os.environ.get("CONTRACTS_REPORT_REPS", "5"))


def _frs(curve, xs):
    return b"".join(fr_bytes(curve, x) for x in xs)


def _time_verify(fn, *cells):
    assert fn(*cells) == contracts.OK, "fixture must verify"
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        rc = fn(*cells)
        times.append(time.perf_counter() - t0)
        assert rc == contracts.OK
    return statistics.median(times)


def build_cases():
    curve = get_curve("bn254")
    out = {}

    # groth16
    from ckb_zkp_tpu.schemes import groth16
    from ckb_zkp_tpu.schemes.groth16 import serialize as g16ser

    rng = random.Random(3)
    params = groth16.generate_random_parameters(Mini.power_off(), curve, rng)
    proof = groth16.create_proof_no_zk(params, Mini.power_on(2, 3, 10))
    out["universal_groth16_verifier"] = (
        contracts.universal_groth16_verifier,
        g16ser.vk_to_bytes(curve, params.vk),
        g16ser.proof_to_bytes(curve, proof),
        _frs(curve, [10]),
    )

    # marlin
    from ckb_zkp_tpu.schemes.marlin import marlin

    rng = random.Random(123)
    srs = marlin.universal_setup(curve, 128, rng)
    ipk, ivk = marlin.index(srs, Mini.power_off())
    mproof = marlin.create_random_proof(ipk, Mini.power_on(2, 3, 10), rng)
    out["universal_marlin_verifier"] = (
        contracts.universal_marlin_verifier,
        ark_encode(curve, ivk),
        ark_encode(curve, mproof),
        _frs(curve, [10]),
    )

    # plonk
    from ckb_zkp_tpu.cli.main import _mini_composer
    from ckb_zkp_tpu.schemes.plonk import default_ks
    from ckb_zkp_tpu.schemes.plonk import serialize as pser
    from ckb_zkp_tpu.schemes.plonk.plonk import Plonk

    p = curve.fr.modulus
    rng = random.Random(21)
    cs = _mini_composer(p, 2, 3, 10)
    psrs = Plonk.setup(curve, 64, rng)
    pk, vk = Plonk.keygen(curve, psrs, cs, default_ks(p))
    pproof = Plonk.prove(curve, pk, cs, rng)
    out["universal_plonk_verifier"] = (
        contracts.universal_plonk_verifier,
        pser.vk_to_bytes(curve, vk),
        pser.proof_to_bytes(curve, pproof),
        ark_encode(curve, cs.public_inputs(), Vec(FR)),
    )

    # spartan nizk + snark
    from ckb_zkp_tpu.schemes.spartan import nizk, snark
    from ckb_zkp_tpu.schemes.spartan.common import NizkParameters

    rng = random.Random(55)
    r1cs = nizk.generate_r1cs(curve, Mini.power_off())
    nparams = nizk.generate_setup_parameters(
        curve, rng, r1cs.num_aux, r1cs.num_inputs
    )
    nproof = nizk.create_nizk_proof(
        curve, nparams, r1cs, Mini.power_on(2, 3, 10),
        r1cs.r1cs_to_hash(), nizk.params_to_hash(curve, nparams), rng,
    )
    out["universal_spartan_nizk_verifier"] = (
        contracts.universal_spartan_nizk_verifier,
        ark_encode(
            curve, (nparams, r1cs), Tup(S(NizkParameters), S(nizk.R1CSInstance))
        ),
        ark_encode(curve, nproof),
        _frs(curve, [10]),
    )

    setup = snark.generate_random_parameters(curve, Mini.power_off(), rng)
    sproof = snark.create_snark_proof(
        curve, setup.params, setup.r1cs, Mini.power_on(2, 3, 10),
        setup.encode, setup.encode_commit,
        setup.r1cs.r1cs_to_hash(),
        snark.snark_params_to_hash(curve, setup.params),
        snark.encode_to_hash(curve, setup.encode_commit), rng,
    )
    out["universal_spartan_snark_verifier"] = (
        contracts.universal_spartan_snark_verifier,
        ark_encode(
            curve,
            (setup.params, setup.r1cs, setup.encode_commit),
            Tup(
                S(snark.SnarkParameters),
                S(nizk.R1CSInstance),
                S(snark.EncodeCommit),
            ),
        ),
        ark_encode(curve, sproof),
        _frs(curve, [10]),
    )

    # bulletproofs
    from ckb_zkp_tpu.schemes.bulletproofs import arithmetic_circuit as bp

    rng = random.Random(7)
    gens, br1cs, bproof = bp.create_random_proof(
        curve, Mini.power_on(2, 3, 10), rng
    )
    out["mini_bulletproofs_verifier"] = (
        contracts.mini_bulletproofs_verifier,
        b"",
        ark_encode(
            curve, (gens, br1cs, bproof),
            Tup(S(bp.Generators), S(bp.R1csCircuit), S(bp.Proof)),
        ),
        _frs(curve, [10]),
    )

    # libra + hyrax: the reference bench-test fixture (tests.rs:503-613)
    from ckb_zkp_tpu.schemes.libra.circuit import Circuit as LiCircuit
    from ckb_zkp_tpu.schemes.libra.zk_linear_gkr import (
        Parameters as LiParams,
        ZKLinearGKRProof,
    )

    rng = random.Random(88)
    circuit = LiCircuit(
        *contracts.MINI_GKR_SIZE, list(contracts.MINI_GKR_LAYERS)
    )
    lparams = LiParams.new(curve, rng, 8)
    inputs = [2, p - 10, 1, 0]
    witnesses = [2, 3, 0, 0]
    lproof, loutput = ZKLinearGKRProof.prover(
        lparams, circuit, inputs, witnesses,
        circuit.circuit_to_hash(curve), lparams.param_to_hash(), rng,
    )
    out["mini_libra_zk_linear_gkr_verifier"] = (
        contracts.mini_libra_zk_linear_gkr_verifier,
        ark_encode(curve, lparams),
        ark_encode(curve, lproof),
        ark_encode(curve, (inputs, loutput), Tup(Vec(FR), Vec(FR))),
    )

    from ckb_zkp_tpu.schemes.hyrax.circuit import Circuit as HyCircuit
    from ckb_zkp_tpu.schemes.hyrax.hyrax_proof import HyraxProof
    from ckb_zkp_tpu.schemes.hyrax.params import Parameters as HyParams

    rng = random.Random(42)
    hcircuit = HyCircuit(
        *contracts.MINI_GKR_SIZE, list(contracts.MINI_GKR_LAYERS)
    )
    hin = [[2, p - 10, 1, 0], [2, 3, 0, 0]]
    hwit = [[2, 3, 0, 0], [2, p - 10, 1, 0]]
    hparams = HyParams.new(curve, rng, 8)
    hproof, hout = HyraxProof.prover(
        hparams, hwit, hin, hcircuit,
        hcircuit.circuit_to_hash(curve), hparams.param_to_hash(), 2, rng,
    )
    out["mini_hyrax_zk_linear_gkr_verifier"] = (
        contracts.mini_hyrax_zk_linear_gkr_verifier,
        ark_encode(curve, hparams),
        ark_encode(curve, hproof),
        ark_encode(curve, (hin, hout), Tup(Vec(Vec(FR)), Vec(Vec(FR)))),
    )

    return out


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "CONTRACTS_r03.json"
    report = {
        "what": "portable cell-data verifier costs, Mini fixture, bn254 "
        "(reference analogue: CKB-VM cycles table, README.md:304-312)",
        "host": "cpu wall-clock (median of %d)" % REPS,
        "contracts": {},
    }
    for name, (fn, vk, proof, pub) in build_cases().items():
        dt = _time_verify(fn, "bn254", vk, proof, pub)
        report["contracts"][name] = {
            "vk_bytes": len(vk),
            "proof_bytes": len(proof),
            "publics_bytes": len(pub),
            "verify_ms": round(dt * 1000.0, 3),
        }
        print(f"{name}: {round(dt*1000,1)} ms, proof {len(proof)} B")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
