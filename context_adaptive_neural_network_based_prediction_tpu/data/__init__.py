from . import extraction, masking  # noqa: F401
