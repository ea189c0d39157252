"""Print per-component cache-key digests for REAL axon compiles.

Wraps jax._src.cache_key.get so every compile of this process prints its
component digests; a tiny unique-shape jit forces one compile. Run twice
(fresh processes) and diff the component lines — the diverging component is
the cross-process cache-miss culprit.

  timeout 600 python -u scripts/probe_cachekey2.py 131
  timeout 600 python -u scripts/probe_cachekey2.py 131
"""
import hashlib
import sys

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402  (registers the persistent cache via ckb_zkp_tpu)
import ckb_zkp_tpu  # noqa: F401,E402
from jax._src import cache_key as ck  # noqa: E402

_orig_get = ck.get


def get(module, devices, compile_options, backend, *a, **kw):
    comps = {}
    entries = [
        ("computation",
         lambda h: ck._hash_computation(h, module, ck.IgnoreCallbacks.NO)),
        ("jaxlib", lambda h: h.update(ck.jaxlib_version_str.encode())),
        ("platform", lambda h: ck._hash_platform(h, backend)),
        ("xla_flags", lambda h: ck._hash_xla_flags(h, ck.get_flag_prefixes())),
        ("compile_options",
         lambda h: ck._hash_serialized_compile_options(
             h, compile_options,
             strip_device_assignment=(backend.platform == "gpu"))),
        ("accel", lambda h: ck._hash_accelerator_config(h, devices)),
        ("hook", lambda h: ck._hash_string(h, ck.custom_hook())),
    ]
    for name, fn in entries:
        h = hashlib.sha256()
        try:
            fn(h)
            comps[name] = h.hexdigest()[:16]
        except Exception as e:  # noqa: BLE001
            comps[name] = f"ERR:{type(e).__name__}"
    key = _orig_get(module, devices, compile_options, backend, *a, **kw)
    print("CACHEKEY", key[-24:], file=sys.stderr, flush=True)
    for name, d in comps.items():
        print(f"  comp {name}: {d}", file=sys.stderr, flush=True)
    return key


ck.get = get
for mod_name in ("jax._src.compiler", "jax._src.interpreters.pxla"):
    mod = sys.modules.get(mod_name)
    if mod is not None and hasattr(mod, "cache_key"):
        mod.cache_key.get = get

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

n = int(sys.argv[1]) if len(sys.argv) > 1 else 131
x = jnp.asarray(np.arange(8 * n, dtype=np.uint32).reshape(8, n))


@jax.jit
def probe_fn(a):
    return (a * a + a) ^ (a >> 3)


out = probe_fn(x)
print("result0:", int(np.asarray(jax.device_get(out.ravel()[:1]))[0]))
