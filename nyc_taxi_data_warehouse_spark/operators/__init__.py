from . import merge  # noqa: F401
