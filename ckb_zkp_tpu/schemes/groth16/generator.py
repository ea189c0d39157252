"""Groth16 trusted setup.

Parity: generate_random_parameters / generate_parameters
(/root/reference/groth16/src/generator.rs:19-286). Query scalars are computed
on device from a single Lagrange-coefficient kernel + transpose sparse
matvecs; the five fixed-base MSMs run as window-table gathers on device
(reference uses FixedBaseMSM, generator.rs:206-256).
"""

from __future__ import annotations

import random

import jax
import jax.numpy as jnp

from ...host.pairing import PairingCurve
from ...ops.field import device_field
from ...ops.msm import device_group
from ...r1cs import ConstraintSynthesizer, R1csShape, SynthesisMode, synthesize
from .qap import QapMatrices
from .types import Parameters, VerifyKey


def generate_random_parameters(
    circuit: ConstraintSynthesizer, curve: PairingCurve, rng: random.Random
) -> Parameters:
    r = curve.fr.modulus
    alpha, beta, gamma, delta = (rng.randrange(1, r) for _ in range(4))
    t = rng.randrange(1, r)
    return generate_parameters(circuit, curve, alpha, beta, gamma, delta, t)


def generate_parameters(
    circuit: ConstraintSynthesizer,
    curve: PairingCurve,
    alpha: int,
    beta: int,
    gamma: int,
    delta: int,
    t: int,
) -> Parameters:
    shape = synthesize(circuit, curve.fr.modulus, SynthesisMode.SETUP)
    return generate_parameters_from_shape(shape, curve, alpha, beta, gamma, delta, t)


def generate_parameters_from_shape(
    shape: R1csShape,
    curve: PairingCurve,
    alpha: int,
    beta: int,
    gamma: int,
    delta: int,
    t: int,
    host_mode: bool | None = None,
) -> Parameters:
    """host_mode=True forces the compile-free host-int instance map and
    (with CKB_ZKP_TPU_HOST_MSM_MAX raised) host fixed-base MSMs — the
    multi-chip dryrun uses this to keep setup off the device budget."""
    p = curve.fr.modulus
    fr = device_field(curve.fr)
    qap = QapMatrices(shape, curve.fr, host_mode=host_mode)
    zt = (pow(t, qap.m, p) - 1) % p
    if zt == 0:
        raise ValueError("t lies in the evaluation domain; resample")

    ni = shape.num_inputs
    gamma_inv = pow(gamma, -1, p)
    delta_inv = pow(delta, -1, p)

    dg1 = device_group(curve, "g1")
    dg2 = device_group(curve, "g2")
    t1 = dg1.fixed_base(curve.g1_gen)
    t2 = dg2.fixed_base(curve.g2_gen)

    if qap.host_mode:
        # small circuit on the TPU tunnel: instance map in host ints
        hu, hv, hw = qap.evaluations_at_host(t)
        contrib_i = [
            (beta * x + alpha * y + z) % p for x, y, z in zip(hu, hv, hw)
        ]
        u_can = dg1.encode_scalars(hu)
        v_can = dg1.encode_scalars(hv)
        gamma_abc_can = dg1.encode_scalars(
            [x * gamma_inv % p for x in contrib_i[:ni]]
        )
        l_can = dg1.encode_scalars([x * delta_inv % p for x in contrib_i[ni:]])
        zd = zt * delta_inv % p
        h_can, cur = [], zd
        for _ in range(qap.m - 1):
            h_can.append(cur)
            cur = cur * t % p
        h_can = dg1.encode_scalars(h_can)
        padded = False
    else:
        # Lagrange kernel + transpose matvecs run through their own jits
        # (big tables/index arrays as runtime operands — captured device
        # arrays embed as literals and blow the tunnel's compile-request
        # limit at 2^20, BENCH r3 run 1); the remaining scalar algebra is
        # one jit over those results. Outputs keep pow2-padded shapes.
        from ...utils import stage, stage_sync

        ga_pad = max(8, 1 << max(0, ni - 1).bit_length())
        with stage("groth16.setup/lagrange"):
            lag = qap.domain.evaluate_all_lagrange_coefficients(t)
            stage_sync(lag)
        with stage("groth16.setup/rmatvec"):
            u = qap.a.rmatvec_padded(lag)
            v = qap.b.rmatvec_padded(lag)
            w = qap.c.rmatvec_padded(lag)
            stage_sync((u, v, w))

        def _setup_scalars(u, v, w):
            beta_c = fr.const(beta, (1,))
            alpha_c = fr.const(alpha, (1,))
            contrib = fr.add(fr.add(fr.mul(beta_c, u), fr.mul(alpha_c, v)), w)
            ncp = contrib.shape[0]
            is_input = (jnp.arange(ncp) < ni)[:, None]
            gamma_abc_s = jnp.where(
                is_input, fr.mul(contrib, fr.const(gamma_inv, (1,))), 0
            )[:ga_pad]
            l_s = jnp.where(
                is_input, 0, fr.mul(contrib, fr.const(delta_inv, (1,)))
            )
            # h padded up to the query width ncp when ncp >= m: ONE compiled
            # fixed-base program and ONE compiled Pippenger program then
            # serve all five queries — each distinct shape costs a separate
            # executable and a multi-second program load through the TPU
            # tunnel. The logical h has m-1 entries; padding scalars are
            # zero (infinity points).
            hpad = max(ncp, qap.m)
            h_s = fr.mul(
                fr.powers(t, hpad), fr.const(zt * delta_inv % p, (1,))
            )
            h_s = jnp.where((jnp.arange(hpad) < qap.m - 1)[:, None], h_s, 0)
            return (
                fr.from_mont(u),
                fr.from_mont(v),
                fr.from_mont(gamma_abc_s),
                fr.from_mont(l_s),
                fr.from_mont(h_s),
            )

        u_can, v_can, gamma_abc_can, l_can, h_can = jax.jit(_setup_scalars)(
            u, v, w
        )
        padded = True

    a_query = dg1.fixed_base_msm(t1, u_can, pad_output=padded)
    b_g1_query = dg1.fixed_base_msm(t1, v_can, pad_output=padded)
    b_g2_query = dg2.fixed_base_msm(t2, v_can, pad_output=padded)
    h_query = dg1.fixed_base_msm(t1, h_can, pad_output=padded)
    l_query = dg1.fixed_base_msm(t1, l_can, pad_output=padded)
    if padded:
        # gamma_abc is tiny (public inputs): host fixed-base over the small
        # device slice, no device decode of full query arrays
        ga_scalars = dg1._scalars_host(gamma_abc_can)[:ni]
        gamma_abc_g1 = [curve.g1.mul(curve.g1_gen, s) for s in ga_scalars]
    else:
        gamma_abc_g1 = dg1.decode_points(dg1.fixed_base_msm(t1, gamma_abc_can))

    g1m, g2m = curve.g1.mul, curve.g2.mul
    vk = VerifyKey(
        alpha_g1=g1m(curve.g1_gen, alpha),
        beta_g2=g2m(curve.g2_gen, beta),
        gamma_g2=g2m(curve.g2_gen, gamma),
        delta_g2=g2m(curve.g2_gen, delta),
        gamma_abc_g1=gamma_abc_g1,
    )
    return Parameters(
        curve=curve,
        vk=vk,
        beta_g1=g1m(curve.g1_gen, beta),
        delta_g1=g1m(curve.g1_gen, delta),
        domain_size=qap.m,
        a_query=a_query,
        b_g1_query=b_g1_query,
        b_g2_query=b_g2_query,
        h_query=h_query,
        l_query=l_query,
        num_inputs=ni,
        num_aux=shape.num_aux,
        num_constraints=shape.num_constraints,
        padded_queries=padded,
    )
