from . import profiling  # noqa: F401
from . import compile_cache  # noqa: F401
