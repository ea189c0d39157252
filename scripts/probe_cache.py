"""Does the JAX persistent compilation cache work on the axon backend?"""
import os
import sys
import time

os.environ["JAX_COMPILATION_CACHE_DIR"] = "/root/jax_cache"
os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"
os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "-1"

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def sync(x):
    np.asarray(jax.device_get(x.ravel()[:1]))


x = jnp.arange(2048, dtype=jnp.uint32)
t0 = time.time(); sync(jax.jit(lambda v: v * 5 + 123)(x)); log(f"jit A: {time.time()-t0:.2f}s")
t0 = time.time(); sync(jax.jit(lambda v: v * 7 + 99)(x)); log(f"jit B: {time.time()-t0:.2f}s")

sys.path.insert(0, "/root/repo")
from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.ops.field import device_field

fr = device_field(get_curve("bn254").fr)
xs = fr.encode([3] * 4096)
t0 = time.time(); sync(fr.mul(xs, xs)); log(f"field mul 4096: {time.time()-t0:.2f}s")

from ckb_zkp_tpu.ops.ntt import get_domain

dom = get_domain(get_curve("bn254").fr, 1 << 13)
ys = fr.encode([5] * (1 << 13))
t0 = time.time(); sync(dom.ntt(ys)); log(f"ntt 2^13: {time.time()-t0:.2f}s")
import subprocess

log(subprocess.run(["du", "-sh", "/root/jax_cache"], capture_output=True, text=True).stdout.strip())
log(subprocess.run(["bash", "-c", "ls /root/jax_cache | wc -l"], capture_output=True, text=True).stdout.strip())
