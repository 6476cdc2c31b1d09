from . import regions, epeg  # noqa: F401
