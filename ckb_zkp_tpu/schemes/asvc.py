"""aSVC: aggregatable subvector commitments (KZG over the Lagrange basis).

Parity: /root/reference/asvc/src/lib.rs:33-439 — key_gen / commit /
prove_pos / verify_pos / verify_upk / update_commit / update_proof /
aggregate_proofs, same key structure (per-position update keys a_i, u_i and
Lagrange commitments l_i). Device work: tau-power tables, the five
fixed-base/variable MSMs, the value->polynomial iNTT, and the sequential
linear divisions for the witness polynomial. Position-subset algebra (A_I,
partial fractions) is tiny and stays on host.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

import jax

from ..host import poly as hpoly
from ..host.curves import AffinePoint
from ..host.pairing import PairingCurve
from ..ops.field import device_field
from ..ops.msm import device_group
from ..ops.ntt import get_domain
from ..ops.poly import poly_divide_linear


@dataclass
class UpdateKey:
    ai: AffinePoint
    ui: AffinePoint


@dataclass
class ProvingKey:
    powers_of_g1: object  # device G1 points, len n+1
    l_of_g1: object  # device G1 points, len n (Lagrange commitments)
    update_keys: list[UpdateKey]


@dataclass
class VerificationKey:
    powers_of_g1: object  # device G1 points, len n+1
    powers_of_g2: list[AffinePoint]  # host, len n+1
    a: AffinePoint  # g1^(tau^n - 1)


@dataclass
class Parameters:
    curve: PairingCurve
    proving_key: ProvingKey
    verification_key: VerificationKey
    n: int
    omega: int


@dataclass
class Commitment:
    commit: AffinePoint


@dataclass
class Proof:
    w: AffinePoint


def key_gen(curve: PairingCurve, n: int, rng: random.Random) -> Parameters:
    p = curve.fr.modulus
    fr = device_field(curve.fr)
    dom = get_domain(curve.fr, n)
    size = dom.n
    tau = rng.randrange(1, p)
    if pow(tau, size, p) == 1:
        raise ValueError("tau in evaluation domain; resample")
    g1 = curve.g1.mul(curve.g1_gen, rng.randrange(1, p))
    g2 = curve.g2.mul(curve.g2_gen, rng.randrange(1, p))

    dg1 = device_group(curve, "g1")
    t1 = dg1.fixed_base(g1)
    taus = fr.from_mont(fr.powers(tau, size + 1))
    powers_of_g1 = dg1.fixed_base_msm(t1, taus)
    powers_of_g2 = [curve.g2.mul(g2, pow(tau, i, p)) for i in range(size + 1)]

    a_point = curve.g1.mul(g1, (pow(tau, size, p) - 1) % p)

    # per-position keys: a_i = g1^(A(tau)/(tau - w^i)), l_i = a_i^(w^i / n),
    # u_i = (l_i - g1)^(1/(tau - w^i))   — batched as three fixed-base MSMs
    omega = dom.omega
    a_tau = (pow(tau, size, p) - 1) % p
    n_inv = pow(size, -1, p)
    denom = fr.encode([(tau - pow(omega, i, p)) % p for i in range(size)])
    denom_inv = fr.batch_inv(denom)
    ai_s = fr.mul(denom_inv, fr.const(a_tau, (1,)))
    wi_over_n = fr.mul(
        fr.powers(omega, size), fr.const(n_inv, (1,))
    )
    li_s = fr.mul(ai_s, wi_over_n)
    ui_s = fr.mul(fr.sub(li_s, fr.ones((size,))), denom_inv)
    ai_pts = dg1.decode_points(dg1.fixed_base_msm(t1, fr.from_mont(ai_s)))
    li_query = dg1.fixed_base_msm(t1, fr.from_mont(li_s))
    ui_pts = dg1.decode_points(dg1.fixed_base_msm(t1, fr.from_mont(ui_s)))
    update_keys = [UpdateKey(ai=a, ui=u) for a, u in zip(ai_pts, ui_pts)]

    return Parameters(
        curve=curve,
        proving_key=ProvingKey(
            powers_of_g1=powers_of_g1, l_of_g1=li_query, update_keys=update_keys
        ),
        verification_key=VerificationKey(
            powers_of_g1=powers_of_g1, powers_of_g2=powers_of_g2, a=a_point
        ),
        n=size,
        omega=omega,
    )


def commit(params: Parameters, values: list[int]) -> Commitment:
    curve = params.curve
    fr = device_field(curve.fr)
    dg1 = device_group(curve, "g1")
    assert 1 <= len(values) <= params.n
    vals = fr.encode(values)
    pts = jax.tree.map(lambda c: c[: len(values)], tuple(params.proving_key.l_of_g1))
    return Commitment(dg1.decode_point(dg1.msm(pts, fr.from_mont(vals))))


def prove_pos(params: Parameters, values: list[int], points: list[int]) -> Proof:
    curve = params.curve
    p = curve.fr.modulus
    fr = device_field(curve.fr)
    dg1 = device_group(curve, "g1")
    dom = get_domain(curve.fr, params.n)
    vals = list(values) + [0] * (params.n - len(values))
    phi = dom.intt(fr.encode(vals))
    # divide by prod (x - w^i): sequential exact linear divisions on device
    q = phi
    for pt in points:
        q, _ = poly_divide_linear(fr, q, pow(params.omega, pt, p))
    pts = jax.tree.map(lambda c: c[: q.shape[0]], tuple(params.proving_key.powers_of_g1))
    w = dg1.decode_point(dg1.msm(pts, fr.from_mont(q)))
    return Proof(w)


def verify_pos(
    params: Parameters,
    commitment: Commitment,
    point_values: list[int],
    points: list[int],
    proof: Proof,
) -> bool:
    curve = params.curve
    p = curve.fr.modulus
    fr = device_field(curve.fr)
    dg1 = device_group(curve, "g1")
    vk = params.verification_key
    omegas = [pow(params.omega, pt, p) for pt in points]
    a_poly = hpoly.from_roots(omegas, p)
    # r(x) = sum_i v_i * A_I(x) / (A_I'(w^i) (x - w^i))
    r_poly = [0]
    for w_i, v in zip(omegas, point_values):
        l_poly, _ = hpoly.divmod_poly(a_poly, [(-w_i) % p, 1], p)
        b = hpoly.evaluate(l_poly, w_i, p)
        r_poly = hpoly.add(r_poly, hpoly.scale(l_poly, v * pow(b, -1, p) % p, p), p)
    g1pts = jax.tree.map(lambda c: c[: len(r_poly)], tuple(vk.powers_of_g1))
    r_value = dg1.decode_point(dg1.msm(g1pts, fr.from_mont(fr.encode(r_poly))))
    inner = curve.g1.sub(commitment.commit, r_value)
    # A_I at tau in G2 (host MSM over the few powers)
    a_value = curve.g2.msm(vk.powers_of_g2[: len(a_poly)], a_poly)
    # e(C - r, g2) == e(w, A_I(tau) in G2)
    res = curve.product_of_pairings(
        [(inner, vk.powers_of_g2[0]), (curve.g1.neg(proof.w), a_value)]
    )
    return res == curve.tower.ONE12


def verify_upk(params: Parameters, point: int, upk: UpdateKey) -> bool:
    curve = params.curve
    p = curve.fr.modulus
    vk = params.verification_key
    omega_i = pow(params.omega, point, p)
    inner = curve.g2.sub(vk.powers_of_g2[1], curve.g2.mul(vk.powers_of_g2[0], omega_i))
    ok1 = curve.product_of_pairings(
        [(upk.ai, inner), (curve.g1.neg(vk.a), vk.powers_of_g2[0])]
    ) == curve.tower.ONE12
    coeff = omega_i * pow(params.n, -1, p) % p
    l_value = curve.g1.mul(upk.ai, coeff)
    # decode g1 = powers_of_g1[0]
    dg1 = device_group(curve, "g1")
    g1_0 = dg1.decode_points(
        jax.tree.map(lambda c: c[:1], tuple(vk.powers_of_g1))
    )[0]
    inner2 = curve.g1.sub(l_value, g1_0)
    ok2 = curve.product_of_pairings(
        [(inner2, vk.powers_of_g2[0]), (curve.g1.neg(upk.ui), inner)]
    ) == curve.tower.ONE12
    return ok1 and ok2


def update_commit(
    params: Parameters, commitment: Commitment, delta: int, point: int, upk: UpdateKey
) -> Commitment:
    curve = params.curve
    p = curve.fr.modulus
    coeff = pow(params.omega, point, p) * pow(params.n, -1, p) % p
    l_value = curve.g1.mul(upk.ai, coeff)
    return Commitment(curve.g1.add(commitment.commit, curve.g1.mul(l_value, delta)))


def update_proof(
    params: Parameters,
    proof: Proof,
    delta: int,
    point_i: int,
    point_j: int,
    upk_i: UpdateKey,
    upk_j: UpdateKey,
) -> Proof:
    curve = params.curve
    p = curve.fr.modulus
    g1 = curve.g1
    if point_i == point_j:
        return Proof(g1.add(proof.w, g1.mul(upk_i.ui, delta)))
    omega_i = pow(params.omega, point_i, p)
    omega_j = pow(params.omega, point_j, p)
    c1 = pow((omega_j - omega_i) % p, -1, p)
    c2 = pow((omega_i - omega_j) % p, -1, p)
    w_ij = g1.add(g1.mul(upk_j.ai, c1), g1.mul(upk_i.ai, c2))
    coeff = omega_j * pow(params.n, -1, p) % p
    u_ij = g1.mul(w_ij, coeff)
    return Proof(g1.add(proof.w, g1.mul(u_ij, delta)))


def aggregate_proofs(params: Parameters, points: list[int], proofs: list[Proof]) -> Proof:
    curve = params.curve
    p = curve.fr.modulus
    omegas = [pow(params.omega, pt, p) for pt in points]
    a_poly = hpoly.from_roots(omegas, p)
    agg = curve.g1.infinity
    for w_i, proof in zip(omegas, proofs):
        a_aside, _ = hpoly.divmod_poly(a_poly, [(-w_i) % p, 1], p)
        c = pow(hpoly.evaluate(a_aside, w_i, p), -1, p)
        agg = curve.g1.add(agg, curve.g1.mul(proof.w, c))
    return Proof(agg)
