"""R1CS -> QAP reduction shared by the generator and prover.

Parity: /root/reference/groth16/src/r1cs_to_qap.rs. The evaluation domain has
size next_pow2(num_constraints + num_inputs); rows [nc, nc+ni) of A carry the
input-binding identity entries (a[nc+i] = input_i), exactly as the reference's
instance/witness maps (r1cs_to_qap.rs:80-95, :139-142).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...ops.field import DeviceField, device_field
from ...ops.ntt import Domain, get_domain
from ...ops.sparse import DeviceCoo
from ...r1cs import R1csShape


def domain_size_for(shape: R1csShape) -> int:
    need = shape.num_constraints + shape.num_inputs
    n = 1
    while n < need:
        n *= 2
    return n


class QapMatrices:
    """Device COO matrices for A (input-augmented), B, C over the QAP domain."""

    def __init__(self, shape: R1csShape, spec):
        self.df: DeviceField = device_field(spec)
        self.m = domain_size_for(shape)
        self.domain: Domain = get_domain(spec, self.m)
        nc, ni = shape.num_constraints, shape.num_inputs
        nv = shape.num_variables
        a_rows = np.concatenate(
            [shape.a.rows, np.arange(nc, nc + ni, dtype=np.int32)]
        )
        a_cols = np.concatenate([shape.a.cols, np.arange(ni, dtype=np.int32)])
        a_coeffs = list(shape.a.coeffs) + [1] * ni
        self.a = DeviceCoo(self.df, a_rows, a_cols, a_coeffs, self.m, nv)
        self.b = DeviceCoo(
            self.df, shape.b.rows, shape.b.cols, shape.b.coeffs, self.m, nv
        )
        self.c = DeviceCoo(
            self.df, shape.c.rows, shape.c.cols, shape.c.coeffs, self.m, nv
        )

    def witness_map(self, z_mont):
        """Full assignment (mont) -> h coefficients (mont, len m-1).

        The reference's hot loop 1 (r1cs_to_qap.rs:113-172): sparse matvecs,
        4 iNTT/coset-NTT pairs, pointwise ops, constant vanishing division.
        """
        df, dom = self.df, self.domain
        if z_mont.shape[0] < self.a.num_cols_pad:  # shape-stable compile cache
            z_mont = jnp.concatenate(
                [z_mont, df.zeros((self.a.num_cols_pad - z_mont.shape[0],))], 0
            )
        a = self.a.matvec(z_mont)
        b = self.b.matvec(z_mont)
        c = self.c.matvec(z_mont)
        ca = dom.coset_ntt(dom.intt(a))
        cb = dom.coset_ntt(dom.intt(b))
        cc = dom.coset_ntt(dom.intt(c))
        q = df.sub(df.mul(ca, cb), cc)
        h = dom.coset_intt(dom.divide_by_vanishing_poly_on_coset(q))
        return h[: self.m - 1]

    def evaluations_at(self, t: int):
        """u_i(t), v_i(t), w_i(t) for every variable i (setup instance map)."""
        lag = self.domain.evaluate_all_lagrange_coefficients(t)  # (m, L)
        u = self.a.rmatvec(lag)
        v = self.b.rmatvec(lag)
        w = self.c.rmatvec(lag)
        return u, v, w
