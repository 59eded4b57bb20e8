from . import hm_vae, structure, trajectory  # noqa: F401
