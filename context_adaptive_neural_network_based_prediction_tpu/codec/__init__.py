from . import cabac, contexts, scans, syntax, rdo, rdoq, deblock  # noqa: F401
