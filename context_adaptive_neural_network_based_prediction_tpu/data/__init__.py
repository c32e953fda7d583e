from . import extraction, masking, datasets, pipeline  # noqa: F401
