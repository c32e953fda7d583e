from . import performance, stats, maps, prediction_comparison  # noqa: F401
