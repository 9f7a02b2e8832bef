from . import preintegration  # noqa: F401
