"""Probe: where does Groth16 setup time go on the TPU tunnel?

Times each stage of generate_parameters_from_shape at BENCH_LOG2 (default 13)
with explicit sync barriers, and reports compile-vs-execute split by running
each jitted piece twice. Optionally enables the persistent compilation cache
(CKB_ZKP_TPU_COMPILE_CACHE=<dir>) to test whether the axon backend honors it.
"""

import os
import sys
import time

cache = os.environ.get("CKB_ZKP_TPU_COMPILE_CACHE", "")
if cache:
    os.environ["JAX_COMPILATION_CACHE_DIR"] = cache
    os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "0"

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

if cache:
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

t_imp = time.time()
from ckb_zkp_tpu.bench_circuits import product_circuit_shape  # noqa: E402
from ckb_zkp_tpu.host.pairing import get_curve  # noqa: E402
from ckb_zkp_tpu.ops.field import device_field  # noqa: E402
from ckb_zkp_tpu.ops.msm import device_group  # noqa: E402
from ckb_zkp_tpu.schemes.groth16.qap import QapMatrices  # noqa: E402
from ckb_zkp_tpu.utils import device_sync  # noqa: E402

print(f"imports: {time.time()-t_imp:.2f}s backend={jax.default_backend()}", file=sys.stderr)


def timed(name, fn, *a, **k):
    t0 = time.time()
    out = fn(*a, **k)
    device_sync(out)
    dt = time.time() - t0
    print(f"  {name}: {dt:.2f}s", file=sys.stderr)
    return out


def main():
    k = int(os.environ.get("BENCH_LOG2", "13"))
    n = 1 << k
    curve = get_curve("bn254")
    p = curve.fr.modulus
    fr = device_field(curve.fr)
    shape = product_circuit_shape(n, p)
    t0 = time.time()
    qap = QapMatrices(shape, curve.fr)
    print(f"qap init (m={qap.m}, host={qap.host_mode}): {time.time()-t0:.2f}s", file=sys.stderr)
    assert not qap.host_mode, "raise BENCH_LOG2 above host cutoff"

    dg1 = device_group(curve, "g1")
    dg2 = device_group(curve, "g2")

    # --- tiny field op: measures per-dispatch tunnel latency ---
    x = fr.encode([3] * 1024)
    timed("field mul 1024 (compile)", lambda: fr.mul(x, x))
    timed("field mul 1024 (warm)", lambda: fr.mul(x, x))

    # --- setup scalars graph ---
    alpha, beta, gamma, delta, t = 5, 7, 11, 13, 0xABCDEF0123456789
    ni = shape.num_inputs
    gamma_inv = pow(gamma, -1, p)
    delta_inv = pow(delta, -1, p)
    zt = (pow(t, qap.m, p) - 1) % p
    import jax.numpy as jnp

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

    jitted = jax.jit(_setup_scalars)
    outs = timed("setup_scalars (compile+run)", jitted)
    timed("setup_scalars (warm)", jitted)
    u_can, v_can, gamma_abc_can, l_can, h_can = outs

    # --- fixed-base tables ---
    t1 = timed("g1 window table (compile+run)", dg1.fixed_base_table, curve.g1_gen)
    t2 = timed("g2 window table (compile+run)", dg2.fixed_base_table, curve.g2_gen)

    # --- fixed-base MSMs ---
    timed("fb_msm g1 u (compile+run)", dg1.fixed_base_msm, t1, u_can, True)
    timed("fb_msm g1 v (warm)", dg1.fixed_base_msm, t1, v_can, True)
    timed("fb_msm g1 h (warm)", dg1.fixed_base_msm, t1, h_can, True)
    timed("fb_msm g1 l (warm)", dg1.fixed_base_msm, t1, l_can, True)
    timed("fb_msm g2 v (compile+run)", dg2.fixed_base_msm, t2, v_can, True)

    # --- prove-side: witness map + variable-base MSM ---
    z = shape.full_assignment()
    z = z + [0] * (qap.num_cols_pad - len(z))
    z_mont = timed("encode witness", fr.encode, z)
    timed("witness_map (compile+run)", qap.witness_map, z_mont)
    timed("witness_map (warm)", qap.witness_map, z_mont)
    z_can = fr.from_mont(z_mont)
    aq = dg1.fixed_base_msm(t1, u_can, True)
    timed("var msm g1 (compile+run)", dg1.msm, aq, z_can)
    timed("var msm g1 (warm)", dg1.msm, aq, z_can)
    bq2 = dg2.fixed_base_msm(t2, v_can, True)
    timed("var msm g2 (compile+run)", dg2.msm, bq2, z_can)
    timed("var msm g2 (warm)", dg2.msm, bq2, z_can)
    print("done", file=sys.stderr)


main()
