from . import hm_vae, structure  # noqa: F401
