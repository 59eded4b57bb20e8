from . import config, logging, viz  # noqa: F401
