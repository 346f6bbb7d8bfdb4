from . import iwp  # noqa: F401
