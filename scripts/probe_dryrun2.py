"""Time the rewritten dryrun_multichip(8) on the virtual CPU mesh."""
import os, sys, time

sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

t0 = time.time()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)
print(f"[{time.time()-t0:6.1f}s] jax up, {len(jax.devices())} devices", flush=True)

import __graft_entry__  # noqa: E402

__graft_entry__.dryrun_multichip(8)
print(f"[{time.time()-t0:6.1f}s] dryrun_multichip(8) OK", flush=True)
