from . import pnn, losses, training, zoo, ipfcn, visualization  # noqa: F401
