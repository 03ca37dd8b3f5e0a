from . import bow  # noqa: F401
