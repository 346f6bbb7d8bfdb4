"""Persistent-compile-cache setup that actually HITS across processes.

The headline fused-fit program costs ~5.5 min of XLA compile on a TPU
v5 lite host, so the persistent compilation cache
(`jax_compilation_cache_dir`) is essential — but with default settings
its key is NOT stable across processes for any program containing
Pallas kernels, and every caller silently pays the full compile again.

Root cause (measured on jax 0.9.0, see BENCH_NOTES.md round 10):
jax's cache key canonicalizes the *outer* StableHLO with a
``strip-debuginfo`` pass, but Pallas TPU kernels are serialized into
``tpu_custom_call`` ``backend_config`` payloads (MLIR bytecode of the
Mosaic module) at *lowering* time — WITH their debug locations. Under
``jax_include_full_tracebacks_in_locations=True`` (the default) those
locations are full Python call-stack tracebacks, which include the
caller's frames: running the same fit from ``python bench.py``
(module ``__main__``), from a script importing ``bench``, and from a
third wrapper produced three distinct cache keys for byte-identical
compute (three ~57 MB cache entries, three ~330 s compiles).

Setting ``jax_include_full_tracebacks_in_locations=False`` reduces
every location to the innermost user frame — for kernel-body ops
that is the kernel source file inside this package, which is stable —
and the serialized program becomes byte-identical across callers
(verified: identical sha256 of the lowered module from two process
styles, and ~2.5% smaller).

Call :func:`enable` before building models (it only touches jax
config, so it is safe — and idempotent — at import time).
"""
from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable(cache_dir: str = None, min_compile_time_secs: float = 1.0):
    """Enable a cross-process-stable persistent compilation cache.

    cache_dir: where to store compiled executables (default: .jax_cache
    next to the package checkout). min_compile_time_secs: only persist
    programs that took at least this long to compile.
    """
    jax.config.update("jax_compilation_cache_dir",
                      cache_dir or DEFAULT_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    # THE load-bearing line: traceback-free locations make the Mosaic
    # kernel payloads (and with them the cache key) caller-independent.
    jax.config.update("jax_include_full_tracebacks_in_locations", False)
