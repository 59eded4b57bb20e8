from . import baselines, inference, latent_opt, metrics, tasks  # noqa: F401
