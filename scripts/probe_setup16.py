"""Warm-cache probe: where does Groth16 SETUP execution time go at 2^16?"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402


def log(m):
    print(m, file=sys.stderr, flush=True)


def sync(x):
    import numpy as np

    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))


def timed(name, fn, *a, **k):
    t0 = time.time()
    out = fn(*a, **k)
    sync(out)
    log(f"  {name}: {time.time()-t0:.2f}s")
    return out


def main():
    k = int(os.environ.get("BENCH_LOG2", "16"))
    n = 1 << k
    import jax.numpy as jnp

    from ckb_zkp_tpu.bench_circuits import product_circuit_shape
    from ckb_zkp_tpu.host.pairing import get_curve
    from ckb_zkp_tpu.ops.field import device_field
    from ckb_zkp_tpu.ops.msm import device_group
    from ckb_zkp_tpu.schemes.groth16.qap import QapMatrices

    curve = get_curve("bn254")
    p = curve.fr.modulus
    fr = device_field(curve.fr)
    shape = product_circuit_shape(n, p)
    t0 = time.time()
    qap = QapMatrices(shape, curve.fr)
    log(f"qap init: {time.time()-t0:.2f}s  m={qap.m} cols_pad={qap.num_cols_pad}")

    dg1 = device_group(curve, "g1")
    dg2 = device_group(curve, "g2")

    # session warmup marker
    timed("warmup tiny op", lambda: fr.mul(fr.encode([3] * 1024), fr.encode([4] * 1024)))

    alpha, beta, gamma, delta, t = 5, 7, 11, 13, 0xABCDEF0123456789
    ni = shape.num_inputs
    gamma_inv = pow(gamma, -1, p)
    delta_inv = pow(delta, -1, p)
    zt = (pow(t, qap.m, p) - 1) % p
    ga_pad = max(8, 1 << max(0, ni - 1).bit_length())

    def _setup_scalars():
        lag = qap.domain.evaluate_all_lagrange_coefficients(t)
        u = qap.a.rmatvec_padded(lag)
        v = qap.b.rmatvec_padded(lag)
        w = qap.c.rmatvec_padded(lag)
        beta_c = fr.const(beta, (1,))
        alpha_c = fr.const(alpha, (1,))
        contrib = fr.add(fr.add(fr.mul(beta_c, u), fr.mul(alpha_c, v)), w)
        ncp = contrib.shape[0]
        is_input = (jnp.arange(ncp) < ni)[:, None]
        gamma_abc_s = jnp.where(
            is_input, fr.mul(contrib, fr.const(gamma_inv, (1,))), 0
        )[:ga_pad]
        l_s = jnp.where(is_input, 0, fr.mul(contrib, fr.const(delta_inv, (1,))))
        h_s = fr.mul(fr.powers(t, qap.m), fr.const(zt * delta_inv % p, (1,)))
        h_s = jnp.where((jnp.arange(qap.m) < qap.m - 1)[:, None], h_s, 0)
        return (
            fr.from_mont(u), fr.from_mont(v), fr.from_mont(gamma_abc_s),
            fr.from_mont(l_s), fr.from_mont(h_s),
        )

    outs = timed("setup_scalars", jax.jit(_setup_scalars))
    u_can, v_can, gamma_abc_can, l_can, h_can = outs
    log(f"  shapes: u={u_can.shape} h={h_can.shape}")

    t1 = timed("g1 table", dg1.fixed_base_table, curve.g1_gen)
    t2 = timed("g2 table", dg2.fixed_base_table, curve.g2_gen)

    timed("fb g1 u", dg1.fixed_base_msm, t1, u_can, True)
    timed("fb g1 v", dg1.fixed_base_msm, t1, v_can, True)
    timed("fb g1 h", dg1.fixed_base_msm, t1, h_can, True)
    timed("fb g1 l", dg1.fixed_base_msm, t1, l_can, True)
    timed("fb g2 v", dg2.fixed_base_msm, t2, v_can, True)
    import numpy as np

    t0 = time.time()
    ga = dg1._scalars_host(gamma_abc_can)[:ni]
    log(f"  gamma_abc host decode: {time.time()-t0:.2f}s")
    # transfer bandwidth probe: full u_can device->host
    t0 = time.time()
    arr = np.asarray(jax.device_get(u_can))
    log(f"  device_get {arr.nbytes/1e6:.0f}MB: {time.time()-t0:.2f}s")
    log("done")


main()
