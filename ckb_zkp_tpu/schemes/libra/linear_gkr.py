"""Plain Libra linear GKR prover/verifier.

Parity: /root/reference/libra/src/{libra_linear_gkr.rs:22-245,
sumcheck.rs:21-176, evaluate.rs:11-130} — per-layer two-phase sumcheck with
eval_hg / eval_fgu bookkeeping, quadratic round polynomials, 32-byte
challenges truncated to 31.
"""

from __future__ import annotations

from dataclasses import dataclass

from ...host.pairing import PairingCurve
from ...serialize.tobytes import fr_bytes, u64_bytes
from ...transcript import Transcript
from ..spartan.polynomial import eval_eq
from .circuit import Circuit, Gate


def _challenge32(curve, transcript, label: bytes) -> int:
    return int.from_bytes(transcript.challenge_bytes(label, 32)[:31], "little") % (
        curve.fr.modulus
    )


def _poly_bytes(curve, coeffs: list[int]) -> bytes:
    return u64_bytes(len(coeffs)) + b"".join(fr_bytes(curve, c) for c in coeffs)


def _poly_eval(coeffs, x, p):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % p
    return acc


def _combine(values: list[int], r: int, p: int) -> list[int]:
    half = len(values) // 2
    return [(r * values[i + half] + (1 - r) * values[i]) % p for i in range(half)]


def eval_value(values: list[int], r: list[int], p: int) -> int:
    eq = eval_eq(r, p)
    return sum(v * e % p for v, e in zip(values, eq)) % p


def eval_output(curve, output: list[int], bit_size: int, transcript):
    p = curve.fr.modulus
    outputs = list(output) + [0] * ((1 << bit_size) - len(output))
    rs = [_challenge32(curve, transcript, b"challenge_nextround") for _ in range(bit_size)]
    return eval_value(outputs, rs, p), rs


def eval_hg(evals_g, v_vec, gates: list[Gate], bit_size: int, p: int):
    n = 1 << bit_size
    mul_hg = [0] * n
    add_hg1 = [0] * n
    add_hg2 = [0] * n
    for gate in gates:
        g, x, y = gate.g, gate.left_node, gate.right_node
        if gate.op == 1:
            mul_hg[x] = (mul_hg[x] + evals_g[g] * v_vec[y]) % p
        elif gate.op == 0:
            add_hg1[x] = (add_hg1[x] + evals_g[g]) % p
            add_hg2[x] = (add_hg2[x] + evals_g[g] * v_vec[y]) % p
    return mul_hg, add_hg1, add_hg2


def eval_fgu(evals_g, ru_table, gates: list[Gate], bit_size: int, p: int):
    n = 1 << bit_size
    mul_hg = [0] * n
    add_hg = [0] * n
    for gate in gates:
        g, x, y = gate.g, gate.left_node, gate.right_node
        if gate.op == 1:
            mul_hg[y] = (mul_hg[y] + evals_g[g] * ru_table[x]) % p
        elif gate.op == 0:
            add_hg[y] = (add_hg[y] + evals_g[g] * ru_table[x]) % p
    return mul_hg, add_hg


def initialize_phase_one(gu, gv, gates, v_vec, bit_size, alpha, beta, p):
    egu = eval_eq(gu, p)
    egv = eval_eq(gv, p)
    eg = [(alpha * a + beta * b) % p for a, b in zip(egu, egv)]
    return eval_hg(eg, v_vec, gates, bit_size, p)


def initialize_phase_two(gu, gv, ru, gates, v_vec, bit_size, alpha, beta, p):
    egu = eval_eq(gu, p)
    egv = eval_eq(gv, p)
    eru = eval_eq(ru, p)
    eval_ru = sum(v * e % p for v, e in zip(v_vec, eru)) % p
    eg = [(alpha * a + beta * b) % p for a, b in zip(egu, egv)]
    mul_hg, add_hg = eval_fgu(eg, eru, gates, bit_size, p)
    return mul_hg, add_hg, eval_ru


@dataclass
class SumCheckProof:
    polys: list[list[int]]  # quadratic coeffs [c, b, a]
    poly_value_at_r: list[int]


def _sumcheck(curve, f_vec, tables, term_fn, bit_size, claim, transcript):
    """Generic round loop shared by phase one/two (term_fn computes the
    per-index summand from the current tables + f)."""
    p = curve.fr.modulus
    two_inv = pow(2, -1, p)
    rs, polys = [], []
    f = list(f_vec)
    tabs = [list(t) for t in tables]
    for _ in range(bit_size):
        size = len(f) // 2
        eval_0 = sum(term_fn(f, tabs, j) for j in range(size)) % p
        eval_1 = (claim - eval_0) % p
        f2 = _combine(f, 2, p)
        tabs2 = [_combine(t, 2, p) for t in tabs]
        eval_2 = sum(term_fn(f2, tabs2, j) for j in range(size)) % p
        a_c = (eval_0 - 2 * eval_1 + eval_2) * two_inv % p
        c_c = eval_0 % p
        b_c = (eval_1 - a_c - c_c) % p
        poly = [c_c, b_c, a_c]
        transcript.append_message(b"poly", _poly_bytes(curve, poly))
        r_i = _challenge32(curve, transcript, b"challenge_nextround")
        f = _combine(f, r_i, p)
        tabs = [_combine(t, r_i, p) for t in tabs]
        claim = _poly_eval(poly, r_i, p)
        rs.append(r_i)
        polys.append(poly)
    return polys, rs, f, tabs


def phase_one_prover(curve, f_vec, g_vec, bit_size, claim, transcript):
    p = curve.fr.modulus

    def term(f, tabs, j):
        mul, a1, a2 = tabs
        return (f[j] * mul[j] + f[j] * a1[j] + a2[j]) % p

    polys, ru, f, tabs = _sumcheck(
        curve, f_vec, g_vec, term, bit_size, claim, transcript
    )
    values = [f[0], tabs[0][0], tabs[1][0], tabs[2][0]]
    transcript.append_message(
        b"claim_final", b"".join(fr_bytes(curve, v) for v in values)
    )
    return SumCheckProof(polys, values), ru


def phase_two_prover(curve, f_vec, g_vec, bit_size, claim, transcript):
    p = curve.fr.modulus
    mul_hg, add_hg, fu = g_vec

    def term(f, tabs, j):
        mul, add = tabs
        return (mul[j] * f[j] % p * fu + add[j] * fu + add[j] * f[j]) % p

    polys, rv, f, tabs = _sumcheck(
        curve, f_vec, (mul_hg, add_hg), term, bit_size, claim, transcript
    )
    values = [f[0], tabs[0][0], tabs[1][0]]
    transcript.append_message(
        b"claim_final", b"".join(fr_bytes(curve, v) for v in values)
    )
    return SumCheckProof(polys, values), rv


@dataclass
class LayerProof:
    proof_phase_one: SumCheckProof
    proof_phase_two: SumCheckProof


@dataclass
class LinearGKRProof:
    proofs: list[LayerProof]

    @classmethod
    def prover(cls, curve: PairingCurve, circuit: Circuit, inputs, witnesses, circuit_hash):
        p = curve.fr.modulus
        transcript = Transcript(b"libra - linear gkr")
        transcript.append_message(b"circuit_to_hash", fr_bytes(curve, circuit_hash))
        evals = circuit.evaluate(p, inputs, witnesses)
        transcript.append_message(
            b"input", b"".join(fr_bytes(curve, v) for v in evals[0])
        )
        transcript.append_message(
            b"output", b"".join(fr_bytes(curve, v) for v in evals[-1])
        )
        alpha, beta = 1, 0
        result_u, gu = eval_output(
            curve, evals[-1], circuit.layers[circuit.depth - 1].bit_size, transcript
        )
        gv = [0] * len(gu)
        result_v = 0
        proofs = []
        for d in range(circuit.depth - 1, 0, -1):
            claim = (alpha * result_u + beta * result_v) % p
            uv_size = circuit.layers[d - 1].bit_size
            g1tables = initialize_phase_one(
                gu, gv, circuit.layers[d].gates, evals[d - 1], uv_size, alpha, beta, p
            )
            proof1, ru = phase_one_prover(
                curve, evals[d - 1], g1tables, uv_size, claim, transcript
            )
            e = proof1.poly_value_at_r
            claim = (e[0] * e[1] + e[0] * e[2] + e[3]) % p
            mul_hg, add_hg, fu = initialize_phase_two(
                gu, gv, ru, circuit.layers[d].gates, evals[d - 1], uv_size, alpha, beta, p
            )
            proof2, rv = phase_two_prover(
                curve, evals[d - 1], (mul_hg, add_hg, fu), uv_size, claim, transcript
            )
            ev = proof2.poly_value_at_r
            proofs.append(LayerProof(proof1, proof2))
            if d > 1:
                gu, gv = ru, rv
                result_u, result_v = fu, ev[0]
                alpha = _challenge32(curve, transcript, b"challenge_alpha")
                beta = _challenge32(curve, transcript, b"challenge_beta")
        return cls(proofs), evals[-1]

    def verify(self, curve: PairingCurve, circuit: Circuit, outputs, inputs, circuit_hash) -> bool:
        p = curve.fr.modulus
        transcript = Transcript(b"libra - linear gkr")
        transcript.append_message(b"circuit_to_hash", fr_bytes(curve, circuit_hash))
        transcript.append_message(b"input", b"".join(fr_bytes(curve, v) for v in inputs))
        transcript.append_message(b"output", b"".join(fr_bytes(curve, v) for v in outputs))
        alpha, beta = 1, 0
        result_u, _ = eval_output(
            curve, outputs, circuit.layers[circuit.depth - 1].bit_size, transcript
        )
        result_v = 0
        eval_ru_x = eval_rv_y = 0
        ru_vec: list[int] = []
        rv_vec: list[int] = []
        if circuit.depth - 1 != len(self.proofs):
            return False
        for d, lproof in enumerate(self.proofs):
            claim = (alpha * result_u + beta * result_v) % p
            proof1, proof2 = lproof.proof_phase_one, lproof.proof_phase_two
            bit_size = circuit.layers[circuit.depth - d - 2].bit_size
            ru_vec, rv_vec = [], []
            for i in range(bit_size):
                poly = proof1.polys[i]
                if (_poly_eval(poly, 0, p) + _poly_eval(poly, 1, p)) % p != claim:
                    return False
                transcript.append_message(b"poly", _poly_bytes(curve, poly))
                r_u = _challenge32(curve, transcript, b"challenge_nextround")
                ru_vec.append(r_u)
                claim = _poly_eval(poly, r_u, p)
            e1 = proof1.poly_value_at_r
            transcript.append_message(
                b"claim_final", b"".join(fr_bytes(curve, v) for v in e1)
            )
            if claim != (e1[0] * e1[1] + e1[0] * e1[2] + e1[3]) % p:
                return False
            claim = (e1[0] * e1[1] + e1[0] * e1[2] + e1[3]) % p
            for i in range(bit_size):
                poly = proof2.polys[i]
                if (_poly_eval(poly, 0, p) + _poly_eval(poly, 1, p)) % p != claim:
                    return False
                transcript.append_message(b"poly", _poly_bytes(curve, poly))
                r_v = _challenge32(curve, transcript, b"challenge_nextround")
                rv_vec.append(r_v)
                claim = _poly_eval(poly, r_v, p)
            e2 = proof2.poly_value_at_r
            transcript.append_message(
                b"claim_final", b"".join(fr_bytes(curve, v) for v in e2)
            )
            if claim != (e2[1] * e2[0] % p * e1[0] + e2[2] * e1[0] + e2[2] * e2[0]) % p:
                return False
            if d < circuit.depth - 2:
                result_u, result_v = e1[0], e2[0]
                alpha = _challenge32(curve, transcript, b"challenge_alpha")
                beta = _challenge32(curve, transcript, b"challenge_beta")
            else:
                eval_ru_x, eval_rv_y = e1[0], e2[0]
        return eval_ru_x == eval_value(
            list(inputs) + [0] * ((1 << len(ru_vec)) - len(inputs)), ru_vec, p
        ) and eval_rv_y == eval_value(
            list(inputs) + [0] * ((1 << len(rv_vec)) - len(inputs)), rv_vec, p
        )
