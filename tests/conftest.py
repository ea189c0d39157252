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
