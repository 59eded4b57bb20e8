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
    # Key by model name + stepping + flags, not flags alone: XLA:CPU also
    # bakes model-derived pseudo-features (+prefer-no-scatter/-gather on
    # some Xeons) into its AOT results, so two hosts with identical flags
    # lines can still produce mutually-poisonous caches (observed as
    # cpu_aot_loader "machine feature not supported on the host" warnings
    # from a same-flags predecessor host).
    from hm_vae_tpu.utils.hostkey import cpu_cache_key

    return f"/tmp/jax_cache_tests_{cpu_cache_key()}"


jax.config.update("jax_compilation_cache_dir", _cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
