from . import laplace, aghq, sampling  # noqa: F401
