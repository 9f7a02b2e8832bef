from . import two_view  # noqa: F401
