"""Groth16 prover — the north-star hot path.

Parity: create_random_proof / create_proof / create_proof_no_zk
(/root/reference/groth16/src/prover.rs:97-228). Pipeline: host synthesis ->
device witness map (sparse matvec + 6 NTTs) -> device Pippenger MSMs -> three
affine points back to host.
"""

from __future__ import annotations

import random

import jax.numpy as jnp

from ...host.curves import AffinePoint
from ...ops.field import device_field
from ...ops.msm import device_group
from ...r1cs import ConstraintSynthesizer, R1csShape, SynthesisMode, synthesize
from .qap import QapMatrices
from .types import Parameters, Proof


def create_random_proof(
    params: Parameters, circuit: ConstraintSynthesizer, rng: random.Random
) -> Proof:
    r_mod = params.curve.fr.modulus
    r = rng.randrange(r_mod)
    s = rng.randrange(r_mod)
    return create_proof(params, circuit, r, s)


def create_proof_no_zk(params: Parameters, circuit: ConstraintSynthesizer) -> Proof:
    return create_proof(params, circuit, 0, 0)


def create_proof(
    params: Parameters, circuit: ConstraintSynthesizer, r: int, s: int
) -> Proof:
    shape = synthesize(circuit, params.curve.fr.modulus, SynthesisMode.PROVE)
    return create_proof_from_shape(params, shape, r, s)


def create_proof_from_shape(
    params: Parameters,
    shape: R1csShape,
    r: int,
    s: int,
    qap: QapMatrices | None = None,
    mesh=None,
) -> Proof:
    """With `mesh` set, the 4-5 Pippenger MSMs (the dominant prover cost)
    shard points per chip and fold partials across the mesh
    (parallel/msm.py), and the QAP witness map's six NTTs run as four-step
    transforms with all_to_all stage exchange (parallel/ntt.py)."""
    curve = params.curve
    p = curve.fr.modulus
    fr = device_field(curve.fr)
    if qap is None:
        qap = QapMatrices(shape, curve.fr)
    assert qap.m == params.domain_size, "circuit does not match parameters"

    from ...utils import stage, stage_sync

    dg1 = device_group(curve, "g1")
    dg2 = device_group(curve, "g2")
    ni = shape.num_inputs
    nv = shape.num_inputs + shape.num_aux
    padded = params.padded_queries
    if qap.host_mode:
        z = shape.full_assignment()
        # small circuit on the TPU tunnel: QAP in host ints, no compiles,
        # host MSMs over host-decoded query points
        with stage("groth16/qap_witness_map_host"):
            h_ints = qap.witness_map_host(z)

        # query points are fixed per circuit: decode once, cache on params
        pts_cache = getattr(params, "_host_pts_cache", None)
        if pts_cache is None:
            pts_cache = params._host_pts_cache = {}

        def host_pts(key, dg, q, sl):
            pts = pts_cache.get(key)
            if pts is None:
                pts = pts_cache[key] = dg.decode_points_host(q)
            return pts[sl]

        ga_acc = curve.g1.msm(host_pts("a", dg1, params.a_query, slice(nv)), z)
        gb2_acc = curve.g2.msm(
            host_pts("b2", dg2, params.b_g2_query, slice(nv)), z
        )
        gb1_acc = (
            curve.g1.msm(host_pts("b1", dg1, params.b_g1_query, slice(nv)), z)
            if r != 0
            else None
        )
        h_acc = curve.g1.msm(
            host_pts("h", dg1, params.h_query, slice(qap.m - 1)), h_ints
        )
        l_sl = (
            slice(ni, ni + shape.num_aux) if padded else slice(shape.num_aux)
        )
        l_acc = curve.g1.msm(host_pts("l", dg1, params.l_query, l_sl), z[ni:])
    else:
        with stage("groth16/witness_limbs"):
            # canonical limbs, cached on the shape (computed once per
            # synthesized witness); padded to the QAP's aligned column count
            # so every MSM runs a shared compiled shape
            raw = shape.witness_limbs(
                fr.L, qap.num_cols_pad if padded else None
            )
        with stage("groth16/encode_witness"):
            # one host->device transfer; canonical limbs feed the MSM digit
            # extraction directly (no from_mont round-trip). The device
            # array is cached on the shape alongside the host limbs: the
            # 64 MB upload at 2^20 costs ~1 s through the TPU tunnel and
            # the synthesized witness is immutable
            cache = getattr(shape, "_z_can_dev", None)
            if cache is None:
                cache = shape._z_can_dev = {}
            z_can = cache.get(raw.shape)
            if z_can is None:
                z_can = cache[raw.shape] = jnp.asarray(raw)
        sdom = None
        if mesh is not None:
            from ...parallel.mesh import SHARD_AXIS
            from ...parallel.ntt import get_sharded_domain

            d = mesh.shape[SHARD_AXIS]
            if qap.m >= d * d:  # four-step needs d | n1 and d | n2
                sdom = get_sharded_domain(curve.fr, qap.m, mesh)
        if sdom is None and qap.m >= QapMatrices.FUSED_MIN:
            with stage("groth16/qap_witness_map"):
                # ONE compiled program: to_mont + matvecs + 6 NTTs +
                # quotient + from_mont (each tunnel dispatch costs ~25 ms)
                hpad = max(qap.num_cols_pad, qap.m) if padded else qap.m
                h_can = qap.witness_map_fused(z_can, out_len=hpad)
                if not padded:
                    h_can = h_can[: qap.m - 1]
                stage_sync(h_can)
        else:
            with stage("groth16/qap_witness_map"):
                z_mont = fr.to_mont(z_can)
                h = qap.witness_map(z_mont, sdom)  # (m, L) mont
                stage_sync(h)
            with stage("groth16/from_mont"):
                h_can = fr.from_mont(h)
                if not padded:
                    h_can = h_can[: qap.m - 1]
                elif qap.num_cols_pad > qap.m:
                    # h_query is padded to the shared query width
                    # (generator.py); pad h the same so every G1 MSM runs
                    # the one compiled program
                    h_can = jnp.concatenate(
                        [h_can,
                         jnp.zeros((qap.num_cols_pad - qap.m, h_can.shape[1]),
                                   h_can.dtype)], axis=0
                    )
                stage_sync((z_can, h_can))

        if mesh is not None:
            from ...parallel.msm import msm_sharded

            msm1 = lambda pts, scl: msm_sharded(dg1, pts, scl, mesh)  # noqa: E731
            msm2 = lambda pts, scl: msm_sharded(dg2, pts, scl, mesh)  # noqa: E731
        else:
            msm1 = dg1.msm
            msm2 = dg2.msm

        with stage("groth16/msm_a"):
            ga_acc = msm1(params.a_query, z_can)
            stage_sync(ga_acc)
        with stage("groth16/msm_b_g2"):
            gb2_acc = msm2(params.b_g2_query, z_can)
            stage_sync(gb2_acc)
        gb1_acc = None
        if r != 0:
            # when r == 0, C has no r*B1 term and the reference skips the
            # G1 b-query MSM entirely (prover.rs:170-179); match that
            with stage("groth16/msm_b_g1"):
                gb1_acc = msm1(params.b_g1_query, z_can)
                stage_sync(gb1_acc)
        with stage("groth16/msm_h"):
            h_acc = msm1(params.h_query, h_can)
            stage_sync(h_acc)
        with stage("groth16/msm_l"):
            # padded l_query holds infinity at input slots, so the full
            # padded z pairs correctly; exact keys pair aux scalars only
            l_acc = msm1(
                params.l_query, z_can if padded else z_can[ni:]
            )
            stage_sync(l_acc)
        with stage("groth16/decode_points"):
            # one batched fetch for all five accumulators: per-leaf
            # device_get costs a ~24 ms tunnel round-trip each (15 leaves);
            # fetching the whole pytree lets jax overlap the transfers
            import jax

            ga_acc, gb2_acc, gb1_acc, h_acc, l_acc = jax.device_get(
                (ga_acc, gb2_acc, gb1_acc, h_acc, l_acc)
            )
            ga_acc = dg1.decode_point(ga_acc)
            gb2_acc = dg2.decode_point(gb2_acc)
            if gb1_acc is not None:
                gb1_acc = dg1.decode_point(gb1_acc)
            h_acc = dg1.decode_point(h_acc)
            l_acc = dg1.decode_point(l_acc)

    g1, g2 = curve.g1, curve.g2
    # A = alpha + sum z_i u_i(t) + r*delta
    a_pt = g1.add(g1.add(params.vk.alpha_g1, ga_acc), g1.mul(params.delta_g1, r))
    # B = beta + sum z_i v_i(t) + s*delta  (G2), B1 same in G1
    b_pt = g2.add(g2.add(params.vk.beta_g2, gb2_acc), g2.mul(params.vk.delta_g2, s))
    # C = l_acc + h_acc + s*A + r*B1 - rs*delta
    c_pt = g1.add(l_acc, h_acc)
    c_pt = g1.add(c_pt, g1.mul(a_pt, s))
    if r != 0:
        b1_pt = g1.add(
            g1.add(params.beta_g1, gb1_acc), g1.mul(params.delta_g1, s)
        )
        c_pt = g1.add(c_pt, g1.mul(b1_pt, r))
        c_pt = g1.sub(c_pt, g1.mul(params.delta_g1, r * s % p))
    return Proof(a=a_pt, b=b_pt, c=c_pt)
