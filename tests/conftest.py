import os

# Tests run on CPU in float64 for numerical parity with the reference;
# an 8-device virtual mesh validates the multi-chip sharding paths.
# NOTE: the JAX_PLATFORMS env var is not honored in this environment (an
# axon TPU plugin wins) — jax.config.update is, so set it before first use.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: identical programs (same model constants)
# recompile across test sessions otherwise — a large share of the
# ~1h15 suite wall-clock on this one-core host.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
# Caller-independent cache keys: Pallas kernel payloads embed full
# Python tracebacks otherwise, so the same program hashes differently
# per calling context (see bayesgp_tpu/utils/compile_cache.py)
jax.config.update("jax_include_full_tracebacks_in_locations", False)
