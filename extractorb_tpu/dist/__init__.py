from . import mesh, sharded_ba  # noqa: F401
