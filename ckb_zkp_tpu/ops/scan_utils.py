"""Trace-compact associative scan/reduce for expensive combiners.

`jax.lax.associative_scan` materializes O(log N) *separate instances* of the
combiner in the trace; with an elliptic-curve complete-add (~1.5k primitives)
that makes XLA compile time explode. These helpers trade a little runtime
depth for a trace that contains O(levels) combiner instances:

  - blocked_reduce:  reshape (G, B), lax.scan over B (1 instance), recurse on G
  - blocked_scan:    within-block inclusive scan + recursive scan over block
                     totals + one broadcast combine to propagate

Both are pytree-generic and require the combiner to broadcast over leading
batch axes (all ops in ckb_zkp_tpu.ops do).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _leading(elems) -> int:
    return jax.tree.leaves(elems)[0].shape[0]


def _pad_to(elems, n, identity):
    cur = _leading(elems)
    if cur == n:
        return elems
    return jax.tree.map(
        lambda x, i: jnp.concatenate(
            [x, jnp.broadcast_to(i, (n - cur, *i.shape))], axis=0
        ),
        elems,
        identity,
    )


def blocked_reduce(combine, elems, identity, block: int = 64):
    """Reduce elems (pytree, leading axis N) with an associative combine.

    `identity` is an element pytree (no leading axis) that is a two-sided
    identity for `combine`.
    """
    n = _leading(elems)
    if n == 1:
        return jax.tree.map(lambda x: x[0], elems)
    if n <= block:
        def step(acc, x):
            return combine(acc, x), None

        acc, _ = jax.lax.scan(step, identity, elems)
        return acc
    g = -(-n // block)
    elems = _pad_to(elems, g * block, identity)
    resh = jax.tree.map(lambda x: x.reshape(g, block, *x.shape[1:]), elems)
    moved = jax.tree.map(lambda x: jnp.moveaxis(x, 1, 0), resh)  # (B, G, ...)
    init = jax.tree.map(lambda i: jnp.broadcast_to(i, (g, *i.shape)), identity)

    def step(acc, x):
        return combine(acc, x), None

    totals, _ = jax.lax.scan(step, init, moved)
    return blocked_reduce(combine, totals, identity, block)


def segment_sum_sorted(
    combine, values, seg_ids, num_segments: int, identity, block: int = 64
):
    """Per-segment reduction of `values` grouped by *sorted* int32 seg_ids.

    Returns a pytree with leading axis `num_segments`; segments with no
    members hold `identity`. Out-of-range ids ( >= num_segments) are dropped.
    Implementation: segmented inclusive scan + scatter of segment tails.
    """
    n = _leading(values)
    first = jnp.concatenate(
        [jnp.ones((1,), bool), seg_ids[1:] != seg_ids[:-1]]
    )

    def seg_combine(a, b):
        va, fa = a
        vb, fb = b
        # where(fb starts a new segment, keep vb, else accumulate)
        merged = jax.tree.map(
            lambda c, y: jnp.where(
                fb.reshape(fb.shape + (1,) * (c.ndim - fb.ndim)), y, c
            ),
            combine(va, vb),
            vb,
        )
        return merged, fa | fb

    scanned, _ = blocked_scan(
        seg_combine, (values, first), (identity, jnp.asarray(False)), block
    )
    ends = jnp.concatenate([seg_ids[1:] != seg_ids[:-1], jnp.ones((1,), bool)])
    target = jnp.where(ends, seg_ids, num_segments).astype(jnp.int32)
    out = jax.tree.map(
        lambda i: jnp.broadcast_to(i, (num_segments, *i.shape)), identity
    )
    return jax.tree.map(
        lambda o, s: o.at[target].set(s, mode="drop"), out, scanned
    )


def blocked_scan(combine, elems, identity, block: int = 64, reverse: bool = False):
    """Inclusive associative scan along axis 0 (pytree-generic)."""
    if reverse:
        flipped = jax.tree.map(lambda x: jnp.flip(x, axis=0), elems)
        out = blocked_scan(combine, flipped, identity, block)
        return jax.tree.map(lambda x: jnp.flip(x, axis=0), out)
    n = _leading(elems)
    if n <= block:
        def step(acc, x):
            acc = combine(acc, x)
            return acc, acc

        _, out = jax.lax.scan(step, identity, elems)
        return out
    g = -(-n // block)
    padded = _pad_to(elems, g * block, identity)
    resh = jax.tree.map(lambda x: x.reshape(g, block, *x.shape[1:]), padded)
    moved = jax.tree.map(lambda x: jnp.moveaxis(x, 1, 0), resh)  # (B, G, ...)
    init = jax.tree.map(lambda i: jnp.broadcast_to(i, (g, *i.shape)), identity)

    def step(acc, x):
        acc = combine(acc, x)
        return acc, acc

    totals, within = jax.lax.scan(step, init, moved)  # within: (B, G, ...)
    gpref = blocked_scan(combine, totals, identity, block)  # (G, ...)
    # exclusive group prefix, broadcast-combined into each block element
    excl = jax.tree.map(
        lambda gp, i: jnp.concatenate([i[None], gp[:-1]], axis=0), gpref, identity
    )  # (G, ...)
    within_gb = jax.tree.map(lambda x: jnp.moveaxis(x, 0, 1), within)  # (G, B, ...)
    excl_b = jax.tree.map(lambda x: x[:, None], excl)  # (G, 1, ...)
    full = combine(excl_b, within_gb)  # broadcast over block axis
    flat = jax.tree.map(lambda x: x.reshape(g * block, *x.shape[2:]), full)
    return jax.tree.map(lambda x: x[:n], flat)


def _mask_tree(mask, tree_a, tree_b):
    """where(mask, a, b) broadcasting the 1-D mask over trailing dims."""
    return jax.tree.map(
        lambda a, b: jnp.where(
            mask.reshape(mask.shape + (1,) * (a.ndim - mask.ndim)), a, b
        ),
        tree_a,
        tree_b,
    )


def hs_scan(combine, elems, reverse: bool = False):
    """Inclusive associative scan via Hillis–Steele distance doubling.

    log2(N) full-width combiner applications under ONE traced fori_loop body
    — the latency-optimal shape for expensive combiners (EC adds): the
    blocked_scan alternative runs ~block*levels narrow sequential steps,
    this runs ceil(log2 N) wide ones.
    """
    n = _leading(elems)
    if n == 1:
        return elems
    logn = (n - 1).bit_length()
    idx = jnp.arange(n, dtype=jnp.int32)

    def body(k, v):
        d = jnp.int32(1) << k
        if reverse:
            prev = jax.tree.map(lambda x: jnp.roll(x, -d, axis=0), v)
            ok = idx < n - d
        else:
            prev = jax.tree.map(lambda x: jnp.roll(x, d, axis=0), v)
            ok = idx >= d
        return _mask_tree(ok, combine(prev, v), v)

    return jax.lax.fori_loop(0, logn, body, elems)


def prefix_at_indices(
    combine,
    elems,
    identity,
    q,
    block: int = 32,
    hs_base: int = 1024,
    leaf_combine=None,
    leaf_identity=None,
    promote=None,
):
    """Inclusive prefix-combine of ``elems[0..q_i]`` for each query index.

    q: (Q,) int32 in [-1, N); q_i = -1 yields `identity`. This is the
    work-efficient replacement for a full scan when only a few prefix values
    are needed (MSM bucket boundaries): block totals are accumulated with one
    lax.scan (O(N) combines, ONE traced combiner instance), the block-total
    prefix is resolved recursively, and each query gathers its block's rows
    and mask-reduces them — O(N + Q*block) combines total versus O(N log N)
    for a Hillis-Steele scan.

    Mixed-representation mode (MSM affine leaves): when `leaf_combine` is
    given, `elems` are in a cheaper *leaf* representation and the O(N)
    level-1 combines use `leaf_combine(acc, leaf) -> acc` instead of
    `combine`; `leaf_identity` pads the leaf array and `promote(leaves)`
    lifts leaves to the accumulator representation for the small
    query-partial scans. Everything past level 1 runs in accumulator form.
    """
    n = _leading(elems)
    qn = q.shape[0]
    leaf = leaf_combine is not None
    lid = leaf_identity if leaf else identity
    ident_q = jax.tree.map(
        lambda i: jnp.broadcast_to(i, (qn, *i.shape)), identity
    )
    qc = jnp.maximum(q, 0)
    if n <= hs_base:
        pref = hs_scan(combine, promote(elems) if leaf else elems)
        out = jax.tree.map(lambda x: x[jnp.minimum(qc, n - 1)], pref)
        return _mask_tree(q >= 0, out, ident_q)
    g = -(-n // block)
    padded = _pad_to(elems, g * block, lid)
    resh = jax.tree.map(lambda x: x.reshape(g, block, *x.shape[1:]), padded)
    moved = jax.tree.map(lambda x: jnp.moveaxis(x, 1, 0), resh)  # (B, G, ...)
    init = jax.tree.map(lambda i: jnp.broadcast_to(i, (g, *i.shape)), identity)
    step_combine = leaf_combine if leaf else combine

    def step(acc, x):
        return step_combine(acc, x), None

    totals, _ = jax.lax.scan(step, init, moved)  # (G, ...) accumulator form
    gq = qc // block
    r = qc % block
    before = prefix_at_indices(
        combine, totals, identity, gq - 1, block, hs_base
    )  # prefix of all blocks strictly before gq
    # within-block partial: gather each query's block rows, mask past r
    idxs = gq[:, None] * block + jnp.arange(block, dtype=jnp.int32)[None]
    rows = jax.tree.map(lambda x: x[idxs], padded)  # (Q, B, ...)
    flat = jax.tree.map(lambda x: x.reshape(qn * block, *x.shape[2:]), rows)
    if leaf:
        flat = promote(flat)
    keep = (jnp.arange(block, dtype=jnp.int32)[None] <= r[:, None]).reshape(-1)
    masked = _mask_tree(
        keep,
        flat,
        jax.tree.map(lambda i: jnp.broadcast_to(i, (qn * block, *i.shape)), identity),
    )
    resq = jax.tree.map(lambda x: x.reshape(qn, block, *x.shape[1:]), masked)
    movq = jax.tree.map(lambda x: jnp.moveaxis(x, 1, 0), resq)  # (B, Q, ...)
    part2 = jax.tree.map(lambda x: x[-1], hs_scan(combine, movq))
    out = combine(before, part2)
    return _mask_tree(q >= 0, out, ident_q)


def hs_segment_sum_sorted(combine, values, seg_ids, num_segments: int, identity):
    """segment_sum_sorted with a Hillis–Steele segmented inclusive scan:
    log2(N) full-width masked combines, then segment tails scattered out."""
    n = _leading(values)
    logn = (n - 1).bit_length() if n > 1 else 0
    idx = jnp.arange(n, dtype=jnp.int32)
    seg = seg_ids.astype(jnp.int32)

    def body(k, v):
        d = jnp.int32(1) << k
        prev = jax.tree.map(lambda x: jnp.roll(x, d, axis=0), v)
        ok = (idx >= d) & (jnp.roll(seg, d) == seg)
        return _mask_tree(ok, combine(prev, v), v)

    scanned = jax.lax.fori_loop(0, logn, body, values)
    ends = jnp.concatenate([seg[1:] != seg[:-1], jnp.ones((1,), bool)])
    target = jnp.where(ends, seg, num_segments).astype(jnp.int32)
    out = jax.tree.map(
        lambda i: jnp.broadcast_to(i, (num_segments, *i.shape)), identity
    )
    return jax.tree.map(
        lambda o, s: o.at[target].set(s, mode="drop"), out, scanned
    )
