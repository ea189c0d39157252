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

    def cubic3_round_many(self, triples) -> list[tuple[int, int, int]]:
        """(e0, e2, e3) of sum_j a*b*c for MANY (A, B, C) device tables with
        ONE decode transfer (the SPARK batched cubic sumcheck round,
        spartan/src/prover.rs:1442-1607: parallel left*right*eq triples plus
        sequential row*col*val triples share one round)."""
        fr = self.fr
        outs = []
        for A, B, C in triples:
            al, ah = self._halves(A)
            bl, bh = self._halves(B)
            cl, ch = self._halves(C)
            outs.append(self._sum(fr.mul(fr.mul(al, bl), cl)))
            outs.append(
                self._sum(
                    fr.mul(
                        fr.mul(
                            self._extend(al, ah, 2), self._extend(bl, bh, 2)
                        ),
                        self._extend(cl, ch, 2),
                    )
                )
            )
            outs.append(
                self._sum(
                    fr.mul(
                        fr.mul(
                            self._extend(al, ah, 3), self._extend(bl, bh, 3)
                        ),
                        self._extend(cl, ch, 3),
                    )
                )
            )
        vals = fr.decode(jnp.stack(outs))
        return [tuple(vals[i : i + 3]) for i in range(0, len(vals), 3)]

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

    def firsts(self, *tables) -> list[int]:
        """Decode element 0 of several tables with one transfer."""
        out = jnp.stack([t[0] for t in tables])
        return self.fr.decode(out)

    # ---- libra/hyrax GKR round kernels (libra/src/sumcheck.rs:21-176) ----
    def libra_p1_round(self, pf, pmul, pa1, pa2) -> tuple[int, int]:
        """(eval_0, eval_2) of sum_j f*mul + f*a1 + a2 (phase one)."""
        fr = self.fr

        def g(f, m, a1, a2):
            return self._sum(fr.add(fr.mul(f, fr.add(m, a1)), a2))

        fl, fh = self._halves(pf)
        ml, mh = self._halves(pmul)
        al, ah = self._halves(pa1)
        bl, bh = self._halves(pa2)
        e0 = g(fl, ml, al, bl)
        e2 = g(
            self._extend(fl, fh, 2), self._extend(ml, mh, 2),
            self._extend(al, ah, 2), self._extend(bl, bh, 2),
        )
        vals = fr.decode(jnp.stack([e0, e2]))
        return vals[0], vals[1]

    def libra_p2_round(self, pf, pmul, padd, fu: int) -> tuple[int, int]:
        """(eval_0, eval_2) of sum_j mul*f*fu + add*fu + add*f (phase two)."""
        fr = self.fr
        fu_enc = fr.encode([fu])

        def g(f, m, a):
            return self._sum(
                fr.add(fr.mul(f, fr.add(fr.mul(m, fu_enc), a)),
                       fr.mul(a, fu_enc))
            )

        fl, fh = self._halves(pf)
        ml, mh = self._halves(pmul)
        al, ah = self._halves(padd)
        e0 = g(fl, ml, al)
        e2 = g(
            self._extend(fl, fh, 2), self._extend(ml, mh, 2),
            self._extend(al, ah, 2),
        )
        vals = fr.decode(jnp.stack([e0, e2]))
        return vals[0], vals[1]

    # ---- hyrax data-parallel zk sumcheck rounds (hyrax/src/
    # zk_sumcheck_proof.rs:493-620): tables carry a leading gate axis and
    # halve along the instance/node axis ----
    def bind_axis1(self, T: jnp.ndarray, r: int) -> jnp.ndarray:
        """combine_with_r along axis 1 of a (G, n, L) table."""
        fr = self.fr
        half = T.shape[1] // 2
        lo, hi = T[:, :half], T[:, half:]
        return fr.add(lo, fr.mul(fr.encode([r]), fr.sub(hi, lo)))

    @staticmethod
    def _halves1(T):
        half = T.shape[1] // 2
        return T[:, :half], T[:, half:]

    def _op_gate(self, mulmask, a, b):
        """per-gate add/mul select: mulmask (G,) bool over (G, s, L)."""
        fr = self.fr
        return jnp.where(mulmask[:, None, None], fr.mul(a, b), fr.add(a, b))

    def hyrax_p1_round(self, TP, CE, li, ri, mulmask):
        """(e0, e2, e3) of sum_{g,t} tp[g,t] * op_g(ce[l_g,t], ce[r_g,t])."""
        fr = self.fr

        def g(tp, ce):
            opv = self._op_gate(mulmask, ce[li], ce[ri])
            v = fr.mul(tp, opv)
            return self._sum(v.reshape(-1, v.shape[-1]))

        tl, th = self._halves1(TP)
        cl, ch = self._halves1(CE)
        e0 = g(tl, cl)
        e2 = g(self._extend(tl, th, 2), self._extend(cl, ch, 2))
        e3 = g(self._extend(tl, th, 3), self._extend(cl, ch, 3))
        vals = fr.decode(jnp.stack([e0, e2, e3]))
        return vals[0], vals[1], vals[2]

    def hyrax_p23_round(self, EQ, V, tpx, pergate, mulmask):
        """(e0, e2) of sum_{g,i} eq[g,i] * tpx[g] * op_g(v[i], pergate[g])."""
        fr = self.fr

        def g(eq, v):
            opv = self._op_gate(mulmask, v[None], pergate[:, None])
            t = fr.mul(fr.mul(eq, tpx[:, None]), opv)
            return self._sum(t.reshape(-1, t.shape[-1]))

        el, eh = self._halves1(EQ)
        vl, vh = self._halves(V)
        e0 = g(el, vl)
        e2 = g(self._extend(el, eh, 2), self._extend(vl, vh, 2))
        vals = fr.decode(jnp.stack([e0, e2]))
        return vals[0], vals[1]

    def one_hot_rows(self, ids, n: int) -> jnp.ndarray:
        """(G, n, L) mont one-hot rows: row g is e_{ids[g]} (eval_eq of the
        bit decomposition of an integer point is an indicator vector)."""
        import numpy as np

        fr = self.fr
        idv = jnp.asarray(np.asarray(ids, dtype=np.int32))
        mask = jnp.arange(n, dtype=jnp.int32)[None, :] == idv[:, None]
        one = fr.ones(())
        return jnp.where(mask[..., None], one, jnp.uint32(0))

    # ---- GKR bookkeeping tables on device (libra/src/evaluate.rs:79-120,
    # libra_linear_gkr.rs:201-244) ----
    def eval_eq(self, rs: list[int]) -> jnp.ndarray:
        """eq(x, rs) table over x in {0,1}^len as (2^len, L) mont limbs
        (bit-reversed build order, matching spartan.polynomial.eval_eq)."""
        fr = self.fr
        table = fr.ones((1,))
        for r in reversed(rs):
            hi = fr.mul(table, fr.encode([r]))
            table = jnp.concatenate([fr.sub(table, hi), hi], axis=0)
        return table

    def eval_value(self, table: jnp.ndarray, rs: list[int]) -> jnp.ndarray:
        """<table, eq(rs)> as a (1, L) mont element (stays on device)."""
        fr = self.fr
        eq = self.eval_eq(rs)
        n = min(table.shape[0], eq.shape[0])
        return self._sum(fr.mul(table[:n], eq[:n]))[None]


def gkr_tables_phase_one(ds, eg, v_dev, gates, bit_size: int):
    """Device eval_hg: scatter-accumulate gate contributions into the
    (2^bit_size,) mul/add tables (libra/src/evaluate.rs:79-103).

    `eg` is the (ng,) device eq-combination table, `v_dev` the (n,) device
    value vector; gates is the static python gate list."""
    import numpy as np

    from .scan_utils import segment_sum_sorted

    fr = ds.fr
    n = 1 << bit_size
    zero = fr.zeros(())

    def seg_acc(pairs, vals):
        """sorted-by-target scatter-add of vals (device) into (n,)."""
        if len(pairs) == 0:
            return fr.zeros((n,))
        order = np.argsort(pairs, kind="stable")
        tgt = jnp.asarray(np.asarray(pairs, dtype=np.int32)[order])
        return segment_sum_sorted(fr.add, vals[jnp.asarray(order)], tgt, n, zero)

    muls = [g for g in gates if g.op == 1]
    adds = [g for g in gates if g.op == 0]
    mul_x = [g.left_node for g in muls]
    add_x = [g.left_node for g in adds]
    mg = jnp.asarray(np.asarray([g.g for g in muls], np.int32).reshape(-1))
    my = jnp.asarray(np.asarray([g.right_node for g in muls], np.int32))
    ag = jnp.asarray(np.asarray([g.g for g in adds], np.int32).reshape(-1))
    ay = jnp.asarray(np.asarray([g.right_node for g in adds], np.int32))
    mul_hg = seg_acc(mul_x, fr.mul(eg[mg], v_dev[my])) if muls else fr.zeros((n,))
    add_hg1 = seg_acc(add_x, eg[ag]) if adds else fr.zeros((n,))
    add_hg2 = seg_acc(add_x, fr.mul(eg[ag], v_dev[ay])) if adds else fr.zeros((n,))
    return mul_hg, add_hg1, add_hg2


def gkr_tables_phase_two(ds, eg, eru, gates, bit_size: int):
    """Device eval_fgu (libra/src/evaluate.rs:105-120): accumulate over y."""
    import numpy as np

    from .scan_utils import segment_sum_sorted

    fr = ds.fr
    n = 1 << bit_size
    zero = fr.zeros(())

    def seg_acc(pairs, vals):
        if len(pairs) == 0:
            return fr.zeros((n,))
        order = np.argsort(pairs, kind="stable")
        tgt = jnp.asarray(np.asarray(pairs, dtype=np.int32)[order])
        return segment_sum_sorted(fr.add, vals[jnp.asarray(order)], tgt, n, zero)

    muls = [g for g in gates if g.op == 1]
    adds = [g for g in gates if g.op == 0]
    mul_hg = (
        seg_acc(
            [g.right_node for g in muls],
            fr.mul(
                eg[jnp.asarray([g.g for g in muls], jnp.int32)],
                eru[jnp.asarray([g.left_node for g in muls], jnp.int32)],
            ),
        )
        if muls
        else fr.zeros((n,))
    )
    add_hg = (
        seg_acc(
            [g.right_node for g in adds],
            fr.mul(
                eg[jnp.asarray([g.g for g in adds], jnp.int32)],
                eru[jnp.asarray([g.left_node for g in adds], jnp.int32)],
            ),
        )
        if adds
        else fr.zeros((n,))
    )
    return mul_hg, add_hg


# threshold below which the pure-host int path is faster than device
# dispatch + transfers (and unit tests never pay XLA compiles)
DEVICE_SUMCHECK_MIN = 1 << 11
