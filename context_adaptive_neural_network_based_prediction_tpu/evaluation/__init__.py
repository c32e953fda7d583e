from . import performance, stats, maps, prediction_comparison, hm_driver  # noqa: F401
