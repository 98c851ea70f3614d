from . import multimodal, readers, sinks  # noqa: F401
