"""ckb-zkp-tpu: TPU-native zero-knowledge proof framework.

A from-scratch JAX/XLA/Pallas implementation of the sec-bit/ckb-zkp feature
set: eight proof schemes over a shared R1CS front-end, a gadget library, CLI
and artifact formats — with the arkworks math substrate (Montgomery fields,
curves, NTT, MSM) re-designed as batched TPU kernels.
"""

import os as _os

import jax as _jax

# Persistent XLA compilation cache: the field/EC kernels produce large
# programs; caching compiles across processes makes tests and CLI usable.
_cache = _os.environ.get(
    "CKB_ZKP_TPU_XLA_CACHE", _os.path.expanduser("~/.cache/ckb_zkp_tpu_xla")
)
if _cache and _cache != "0":
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

__version__ = "0.1.0"
