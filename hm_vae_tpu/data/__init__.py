from . import dataset, layout, synthetic  # noqa: F401
