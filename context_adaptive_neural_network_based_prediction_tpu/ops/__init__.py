from . import intra  # noqa: F401
