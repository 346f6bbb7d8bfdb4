from . import block_tridiag  # noqa: F401
