"""Device-resident sumcheck eval tables.

SURVEY.md §7 hard part #4: the sumcheck schemes (spartan/libra/hyrax) run
O(log n) rounds whose per-round work is a recurrence over halving eval
tables (`combine_with_r` / `bound_poly_var_bot`). The reference does this on
host CPU (spartan/src/prover.rs:422+); here the tables live on device as
Montgomery (N, L) limb arrays and only the 2-3 round scalars cross to the
host (where the sigma commitments and the transcript run).

Each table size compiles its own small graph (a handful of ~200-eqn field
kernels); shapes are powers of two so the persistent cache covers every
round of every instance size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..host.field import FieldSpec
from .field import DeviceField, device_field


class DeviceSumcheck:
    """Batched table ops for one scalar field."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        self.fr: DeviceField = device_field(spec)

    # ---- host <-> device ----
    def encode_table(self, values: list[int]) -> jnp.ndarray:
        return self.fr.encode(values)

    def decode_scalar(self, v) -> int:
        return self.fr.decode(v.reshape(1, -1))[0]

    # ---- halving recurrences ----
    def bind(self, table: jnp.ndarray, r: int) -> jnp.ndarray:
        """combine_with_r: lo + r*(hi - lo), halving the leading axis."""
        fr = self.fr
        half = table.shape[0] // 2
        lo, hi = table[:half], table[half:]
        rr = fr.encode([r])
        return fr.add(lo, fr.mul(rr, fr.sub(hi, lo)))

    @staticmethod
    def _halves(table):
        half = table.shape[0] // 2
        return table[:half], table[half:]

    def _extend(self, lo, hi, k: int):
        """combine_with_n at integer point k: lo + k*(hi - lo), k in {2,3}."""
        fr = self.fr
        d = fr.sub(hi, lo)
        out = fr.add(lo, fr.add(d, d))
        if k == 3:
            out = fr.add(out, d)
        return out

    def _sum(self, v):
        """Tree-sum a (N, L) Montgomery column down to one element."""
        fr = self.fr
        while v.shape[0] > 1:
            half = v.shape[0] // 2
            v = fr.add(v[:half], v[half:])
        return v[0]

    # ---- round kernels ----
    def cubic_round(self, pa, pb, pc, peq) -> tuple[int, int, int]:
        """(eval_0, eval_2, eval_3) of sum_j peq*(pa*pb - pc) (phase one)."""
        fr = self.fr

        def g(a, b, c, e):
            return self._sum(fr.mul(e, fr.sub(fr.mul(a, b), c)))

        al, ah = self._halves(pa)
        bl, bh = self._halves(pb)
        cl, ch = self._halves(pc)
        el, eh = self._halves(peq)
        e0 = g(al, bl, cl, el)
        e2 = g(
            self._extend(al, ah, 2), self._extend(bl, bh, 2),
            self._extend(cl, ch, 2), self._extend(el, eh, 2),
        )
        e3 = g(
            self._extend(al, ah, 3), self._extend(bl, bh, 3),
            self._extend(cl, ch, 3), self._extend(el, eh, 3),
        )
        out = jnp.stack([e0, e2, e3])
        vals = self.fr.decode(out)
        return vals[0], vals[1], vals[2]

    def quad_round(self, pabc, pz) -> tuple[int, int]:
        """(eval_0, eval_2) of sum_j pabc*pz (phase two)."""
        fr = self.fr
        al, ah = self._halves(pabc)
        zl, zh = self._halves(pz)
        e0 = self._sum(fr.mul(al, zl))
        e2 = self._sum(
            fr.mul(self._extend(al, ah, 2), self._extend(zl, zh, 2))
        )
        vals = self.fr.decode(jnp.stack([e0, e2]))
        return vals[0], vals[1]

    def first(self, table) -> int:
        return self.decode_scalar(table[0])


# threshold below which the pure-host int path is faster than device
# dispatch + transfers (and unit tests never pay XLA compiles)
DEVICE_SUMCHECK_MIN = 1 << 11
