from . import wavefront, mesh, tiled, sharded_training  # noqa: F401
