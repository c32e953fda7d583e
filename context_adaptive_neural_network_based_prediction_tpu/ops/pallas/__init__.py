from . import fc_forward  # noqa: F401
