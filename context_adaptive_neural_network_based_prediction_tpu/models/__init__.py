from . import pnn, losses  # noqa: F401
