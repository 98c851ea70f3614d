from . import sessionize, weather_stream  # noqa: F401
