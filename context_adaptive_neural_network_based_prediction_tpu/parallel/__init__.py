from . import wavefront  # noqa: F401
