from . import clahe, timing, verbose  # noqa: F401
