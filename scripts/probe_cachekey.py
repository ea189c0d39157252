"""Diagnose per-process XLA cache-key instability (round 5).

Every fresh process recompiles the big MSM programs (~250 s G1, ~960 s G2)
even though the persistent cache holds entries for the same logical program.
Lower the G1 MSM jit from ShapeDtypeStructs (NO device data, NO dispatch)
and hash the StableHLO; run twice and diff:
  python -u scripts/probe_cachekey.py && python -u scripts/probe_cachekey.py

StableHLO hash differs across runs  -> nondeterministic tracing/lowering.
StableHLO matches                   -> compile-options/backend metadata
                                       nondeterminism (cache key layer).
"""
import hashlib
import re
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp  # noqa: F401

from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.ops.msm import device_group

curve = get_curve("bn254")
dg = device_group(curve, "g1")
n = 1081344
L = dg.fq.L
sds = jax.ShapeDtypeStruct
P = (sds((n, L), "uint32"), sds((n, L), "uint32"), sds((n, L), "uint32"))
scalars = sds((n, dg.fr.L), "uint32")

lowered = dg._msm_jit.lower(P, scalars)
text = lowered.as_text()
print("stablehlo sha256:", hashlib.sha256(text.encode()).hexdigest())
print("stablehlo bytes:", len(text))
# location/name strings are the usual instability carriers; strip and rehash
stripped = re.sub(r'loc\([^)]*\)', "", text)
stripped = re.sub(r'#loc[0-9]*( = .*)?', "", stripped)
print("stripped sha256:", hashlib.sha256(stripped.encode()).hexdigest())
if "--dump" in sys.argv:
    open(sys.argv[sys.argv.index("--dump") + 1], "w").write(text)
