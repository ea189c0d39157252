"""Observability helpers.

The reference's only profiling is `std::time::Instant` deltas printed from
tests/CLI (e.g. groth16/tests/mini.rs:51-91) and CKB-VM cycle counts
(SURVEY.md §5). Here: an env-gated stage timer (`CKB_ZKP_TPU_TRACE=1`)
printing per-stage wall-clock to stderr, plus an optional JAX profiler trace
dump (`CKB_ZKP_TPU_XPROF=<dir>`) for xprof/tensorboard.
"""

from __future__ import annotations

import contextlib
import os
import sys
import time

TRACE = os.environ.get("CKB_ZKP_TPU_TRACE", "") not in ("", "0")
_XPROF_DIR = os.environ.get("CKB_ZKP_TPU_XPROF", "")


def device_sync(out) -> None:
    """Real execution barrier: fetch one element of each array leaf.

    `jax.block_until_ready` only acks dispatch on the axon TPU-tunnel
    platform; a transfer is the one reliable way to wait for completion.
    """
    import jax
    import numpy as np

    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))


def stage_sync(out) -> None:
    """Sync a stage's device outputs, but only when tracing — so traced runs
    attribute device time to the right stage while untraced runs keep full
    async pipelining."""
    if TRACE:
        device_sync(out)


@contextlib.contextmanager
def stage(name: str, sync=None):
    """Time a pipeline stage. `sync` (optional) is a value/pytree synced via
    device_sync before stopping the clock so device work counts."""
    if not TRACE:
        yield
        return
    t0 = time.time()
    try:
        yield
    finally:
        if sync is not None:
            device_sync(sync)
        print(f"[ckb-zkp-tpu] {name}: {time.time() - t0:.3f}s", file=sys.stderr)


@contextlib.contextmanager
def xprof_trace(tag: str):
    """Capture a JAX profiler trace if CKB_ZKP_TPU_XPROF is set."""
    if not _XPROF_DIR:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(_XPROF_DIR, tag)):
        yield
