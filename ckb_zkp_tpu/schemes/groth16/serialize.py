"""Groth16 key/proof (de)serialization, ark-0.2 wire format.

Field order matches the reference derives exactly
(/root/reference/groth16/src/lib.rs:51-91): Proof{a,b,c};
VerifyKey{alpha_g1,beta_g2,gamma_g2,delta_g2,gamma_abc_g1};
Parameters{vk,beta_g1,delta_g1,a_query,b_g1_query,b_g2_query,h_query,l_query}.
"""

from __future__ import annotations

import io

from ...host.pairing import PairingCurve
from ...ops.msm import device_group
from ...serialize.ark import G1Codec, G2Codec, read_u64, write_u64
from .types import Parameters, Proof, VerifyKey


def _codecs(curve: PairingCurve):
    return G1Codec(curve), G2Codec(curve)


def proof_to_bytes(curve: PairingCurve, proof: Proof) -> bytes:
    g1, g2 = _codecs(curve)
    return g1.to_bytes(proof.a) + g2.to_bytes(proof.b) + g1.to_bytes(proof.c)


def proof_from_bytes(curve: PairingCurve, data: bytes) -> Proof:
    g1, g2 = _codecs(curve)
    buf = io.BytesIO(data)
    return Proof(a=g1.read(buf), b=g2.read(buf), c=g1.read(buf))


def vk_to_bytes(curve: PairingCurve, vk: VerifyKey) -> bytes:
    g1, g2 = _codecs(curve)
    buf = io.BytesIO()
    buf.write(g1.to_bytes(vk.alpha_g1))
    buf.write(g2.to_bytes(vk.beta_g2))
    buf.write(g2.to_bytes(vk.gamma_g2))
    buf.write(g2.to_bytes(vk.delta_g2))
    write_u64(buf, len(vk.gamma_abc_g1))
    for p in vk.gamma_abc_g1:
        buf.write(g1.to_bytes(p))
    return buf.getvalue()


def vk_from_bytes(curve: PairingCurve, data: bytes) -> VerifyKey:
    g1, g2 = _codecs(curve)
    buf = io.BytesIO(data)
    alpha_g1 = g1.read(buf)
    beta_g2 = g2.read(buf)
    gamma_g2 = g2.read(buf)
    delta_g2 = g2.read(buf)
    n = read_u64(buf)
    gamma_abc = [g1.read(buf) for _ in range(n)]
    return VerifyKey(alpha_g1, beta_g2, gamma_g2, delta_g2, gamma_abc)


def parameters_to_bytes(params: Parameters) -> bytes:
    curve = params.curve
    g1c, g2c = _codecs(curve)
    dg1 = device_group(curve, "g1")
    dg2 = device_group(curve, "g2")
    buf = io.BytesIO()
    buf.write(vk_to_bytes(curve, params.vk))
    buf.write(g1c.to_bytes(params.beta_g1))
    buf.write(g1c.to_bytes(params.delta_g1))
    for codec, dg, query in (
        (g1c, dg1, params.a_query),
        (g1c, dg1, params.b_g1_query),
        (g2c, dg2, params.b_g2_query),
        (g1c, dg1, params.h_query),
        (g1c, dg1, params.l_query),
    ):
        pts = dg.decode_points(query)
        write_u64(buf, len(pts))
        for p in pts:
            buf.write(codec.to_bytes(p))
    return buf.getvalue()


def parameters_from_bytes(curve: PairingCurve, data: bytes) -> Parameters:
    g1c, g2c = _codecs(curve)
    dg1 = device_group(curve, "g1")
    dg2 = device_group(curve, "g2")
    buf = io.BytesIO(data)
    vk_alpha = g1c.read(buf)
    beta_g2 = g2c.read(buf)
    gamma_g2 = g2c.read(buf)
    delta_g2 = g2c.read(buf)
    n = read_u64(buf)
    gamma_abc = [g1c.read(buf) for _ in range(n)]
    vk = VerifyKey(vk_alpha, beta_g2, gamma_g2, delta_g2, gamma_abc)
    beta_g1 = g1c.read(buf)
    delta_g1 = g1c.read(buf)
    queries = []
    for codec, dg in ((g1c, dg1), (g1c, dg1), (g2c, dg2), (g1c, dg1), (g1c, dg1)):
        k = read_u64(buf)
        pts = [codec.read(buf) for _ in range(k)]
        queries.append(dg.encode_points(pts))
    a_query, b_g1_query, b_g2_query, h_query, l_query = queries
    return Parameters(
        curve=curve,
        vk=vk,
        beta_g1=beta_g1,
        delta_g1=delta_g1,
        domain_size=_leading_len(h_query) + 1,
        a_query=a_query,
        b_g1_query=b_g1_query,
        b_g2_query=b_g2_query,
        h_query=h_query,
        l_query=l_query,
        num_inputs=len(gamma_abc),
        num_aux=_leading_len(l_query),
        num_constraints=0,
    )


def _leading_len(point_arrays) -> int:
    return point_arrays[0].shape[0]
