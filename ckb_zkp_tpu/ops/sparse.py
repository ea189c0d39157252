"""Device sparse matrices over Fr (COO, row- and col-sorted views).

The reference walks Vec-of-Vec rows per constraint
(/root/reference/groth16/src/prover.rs:134-146, r1cs_to_qap.rs:131-138); here
the same evaluation is a gather + batched Montgomery mul + segmented tree
reduction, fully on device.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .field import DeviceField
from .scan_utils import segment_sum_sorted

# Query/column arrays pad to the MSM scan kernels' tile alignment (32 x 8 x
# 128, ops/msm._rcb_align) instead of the next power of two once they exceed
# it: a 2^20+2-variable circuit otherwise pads its a/b/l query MSMs to 2^21 —
# doubling the dominant prover cost for ~zero compile-cache benefit (each
# bench size is warm-cached by exact shape anyway).
COL_ALIGN = 32 * 8 * 128


def aligned_cols(n: int) -> int:
    """Shared column-padding rule: pow2 below COL_ALIGN, COL_ALIGN-multiple
    above (always <= the old pow2 padding)."""
    pow2 = max(8, 1 << max(0, n - 1).bit_length())
    return min(pow2, -(-n // COL_ALIGN) * COL_ALIGN)


class DeviceCoo:
    """COO matrix with device arrays; supports y = M @ z and y = M^T @ z."""

    def __init__(
        self,
        df: DeviceField,
        rows: np.ndarray,
        cols: np.ndarray,
        coeffs: list[int],
        num_rows: int,
        num_cols: int,
    ):
        self.df = df
        self.num_rows = num_rows
        self.num_cols = num_cols
        # pad: nnz and num_cols to powers of two so compiled graphs are
        # shared across the A/B/C matrices and nearby circuit sizes
        self.nnz = len(coeffs)
        self.nnz_pad = max(8, 1 << max(0, self.nnz - 1).bit_length())
        self.num_cols_pad = aligned_cols(num_cols)
        npad = self.nnz_pad - self.nnz
        rows = np.concatenate(
            [np.asarray(rows, dtype=np.int32), np.full(npad, num_rows, np.int32)]
        )
        cols = np.concatenate(
            [np.asarray(cols, dtype=np.int32), np.full(npad, self.num_cols_pad, np.int32)]
        )
        # fast path for the overwhelmingly common unit coefficient: one
        # Montgomery row broadcast instead of nnz python-int conversions
        # (~25 s of host time per QAP build at 2^20 — bench-critical)
        coeffs = list(coeffs)
        if coeffs and all(c == 1 for c in coeffs):
            one_row = np.asarray(df.r_limbs, dtype=np.uint32)
            coeff_dev = np.zeros((self.nnz_pad, df.L), dtype=np.uint32)
            coeff_dev[: self.nnz] = one_row
        else:
            coeff_dev = df.encode(coeffs + [0] * npad)
        # row-sorted view (for M @ z); sentinel ids sort last and are dropped
        order_r = np.argsort(rows, kind="stable")
        self.r_rows = jnp.asarray(rows[order_r])
        self.r_cols = jnp.asarray(np.minimum(cols[order_r], num_cols - 1))
        self.r_coeffs = coeff_dev[jnp.asarray(order_r)]
        # col-sorted view (for M^T @ z, i.e. per-variable sums in setup)
        order_c = np.argsort(cols, kind="stable")
        self.c_rows = jnp.asarray(np.minimum(rows[order_c], num_rows - 1))
        self.c_cols = jnp.asarray(cols[order_c])
        self.c_coeffs = coeff_dev[jnp.asarray(order_c)]
        # index/coeff arrays enter the jitted cores as ARGUMENTS: captured
        # device arrays embed as dense literals in the lowered program and
        # blow the TPU tunnel's compile-request limit at 2^20+ nnz
        self._core = jax.jit(self._gather_mul_reduce, static_argnames=("out_len",))

    def matvec(self, z: jnp.ndarray) -> jnp.ndarray:
        """z: (>=num_cols, L) mont -> (num_rows, L) mont."""
        return self._core(
            z, self.r_cols, self.r_coeffs, self.r_rows, out_len=self.num_rows
        )

    def rmatvec(self, z: jnp.ndarray) -> jnp.ndarray:
        """z: (num_rows, L) mont -> (num_cols, L) mont (transpose product)."""
        return self.rmatvec_padded(z)[: self.num_cols]

    def rmatvec_padded(self, z: jnp.ndarray) -> jnp.ndarray:
        """Like rmatvec but keeps the pow2-padded (num_cols_pad, L) shape."""
        return self._core(
            z, self.c_rows, self.c_coeffs, self.c_cols,
            out_len=self.num_cols_pad,
        )

    def _gather_mul_reduce(self, z, idx_gather, coeffs, seg_ids, *, out_len):
        df = self.df
        if self.nnz == 0:
            return df.zeros((out_len,))
        vals = df.mul(z[idx_gather], coeffs)
        return segment_sum_sorted(
            df.add, vals, seg_ids, out_len, df.zeros(())
        )

