"""Test configuration: force an 8-device virtual CPU backend.

Multi-chip hardware is not needed for correctness tests — the standard JAX
trick of faking N host devices exercises every sharding/collective path.

Note: the environment ships a sitecustomize that pins JAX_PLATFORMS=axon (the
TPU tunnel), so the env var alone is not enough; ``jax.config.update`` after
import takes precedence.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache makes repeated test runs fast.  The directory is
# keyed by the host's CPU feature flags: XLA:CPU AOT results compiled on a
# different machine type still LOAD (with an error log about unsupported
# target features) but can execute with silently wrong numerics — observed
# here as a train-descent test failing only under the cache after the
# container migrated hosts.
def _cpu_cache_dir():
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    key = hashlib.sha1(line.encode()).hexdigest()[:12]
                    break
            else:
                key = "generic"
    except OSError:
        key = "generic"
    return f"/tmp/jax_cache_tests_{key}"


jax.config.update("jax_compilation_cache_dir", _cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
