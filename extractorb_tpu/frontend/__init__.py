from . import pyramid, blur, fast  # noqa: F401
