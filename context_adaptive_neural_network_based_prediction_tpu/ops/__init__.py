from . import intra, transform, reference_samples  # noqa: F401
