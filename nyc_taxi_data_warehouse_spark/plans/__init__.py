from . import features, intermediate, marts, nyc_views, staging  # noqa: F401
