from . import dedup, merge, quality, scd, similarity  # noqa: F401
