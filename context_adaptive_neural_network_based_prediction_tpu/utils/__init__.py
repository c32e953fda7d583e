from . import color, metrics, images, yuv, parsing, paths  # noqa: F401
