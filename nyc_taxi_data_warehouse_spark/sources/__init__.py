from . import catalog, multimodal, readers, sinks  # noqa: F401
