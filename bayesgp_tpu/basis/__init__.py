from . import osplines, bsplines, sgp, priors  # noqa: F401
