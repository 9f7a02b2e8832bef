from . import calib, preintegration  # noqa: F401
