"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU needed).

The container's sitecustomize registers the `axon` TPU-tunnel platform and
pins jax to it; tests must override BOTH the env var and the jax config (the
tunnel's remote compile makes CPU-sized unit tests pathologically slow).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

# The persistent compilation cache segfaults this box's XLA:CPU inside
# backend.deserialize_executable once a process has ~170 loaded executables
# (deterministic at full-suite scale, even on a freshly written cache —
# round-4 bisection; the cpu_aot_loader logs machine-feature mismatches for
# the AOT blobs it reloads). The in-process jit cache is unaffected; the
# full suite pays fresh XLA:CPU compiles each run. Re-enable explicitly via
# CKB_ZKP_TPU_TEST_CACHE=1 to experiment.
if os.environ.get("CKB_ZKP_TPU_TEST_CACHE", "") in ("", "0"):
    jax.config.update("jax_enable_compilation_cache", False)
