"""CLI entry points (flag-compatible with the reference drivers)."""


def apply_platform_env() -> None:
    """Honour ``HMVAE_PLATFORM=cpu|tpu|...`` for CLI runs.

    Some environments pin ``JAX_PLATFORMS`` ahead of the user (e.g. a
    sitecustomize selecting a TPU relay plugin), and a dead relay blocks
    ``jax.devices()`` for ~25 minutes before raising.  ``jax.config.update``
    after import still wins over the env var, so a dedicated variable gives
    CLI users (and CI) a working backend override.  No-op when unset.
    """
    import os

    p = os.environ.get("HMVAE_PLATFORM")
    if p:
        import jax

        jax.config.update("jax_platforms", p)

    # multi-host: HMVAE_DIST=1 wires this process into a pod-wide runtime
    # (must happen before the first backend touch, hence here)
    from ..parallel.multihost import maybe_initialize_distributed

    maybe_initialize_distributed()
