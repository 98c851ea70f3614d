from . import features, intermediate, marts, nyc_views, pipeline, staging  # noqa: F401
