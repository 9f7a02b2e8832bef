from . import lie, camera, padding  # noqa: F401
