from . import compat, text, vectors  # noqa: F401
