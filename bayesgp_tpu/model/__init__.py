from . import build, families, objective  # noqa: F401
