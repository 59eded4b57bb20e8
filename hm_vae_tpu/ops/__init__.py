from . import fk, rotations, skeleton_nn, topology  # noqa: F401
