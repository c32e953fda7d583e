from . import cabac  # noqa: F401
