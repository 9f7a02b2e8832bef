from . import map as map_state  # noqa: F401
from . import tracking, system  # noqa: F401
