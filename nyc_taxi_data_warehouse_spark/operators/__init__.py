from . import dedup, merge, quality, scd, similarity, skew  # noqa: F401
