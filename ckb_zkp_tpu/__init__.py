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
# Keyed by platform: CPU executables AOT-compiled by the remote TPU-tunnel
# helper carry its host ISA flags and must not be loaded on this machine.


def _set_xla_cache_dir(platform: str | None = None) -> None:
    base = _os.environ.get(
        "CKB_ZKP_TPU_XLA_CACHE", _os.path.expanduser("~/.cache/ckb_zkp_tpu_xla")
    )
    if not base or base == "0":
        return
    if platform is None:
        platform = _os.environ.get("JAX_PLATFORMS", "") or "default"
    platform = platform.split(",")[0].strip() or "default"
    path = base if platform == "default" else f"{base}_{platform}"
    _os.makedirs(path, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", path)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


_set_xla_cache_dir()

__version__ = "0.1.0"
