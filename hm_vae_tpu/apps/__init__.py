from . import baselines, latent_opt, metrics, tasks  # noqa: F401
