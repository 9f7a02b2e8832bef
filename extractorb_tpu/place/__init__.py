from . import vocab, database  # noqa: F401
