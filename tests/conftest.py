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
# NO persistent compile cache on the CPU test path (round 15): XLA:CPU
# deserialization of a persisted executable SIGSEGVs reproducibly (the
# same landmine that keeps utils/prog_cache CPU-gated). This became
# live when backend-array lifting made same-shape programs
# byte-identical across tests — the resulting disk-cache hits crashed
# the suite inside jax's _cache_read. Costs recompiles across test
# sessions; correctness over speed.
# Caller-independent cache keys: Pallas kernel payloads embed full
# Python tracebacks otherwise, so the same program hashes differently
# per calling context (see bayesgp_tpu/utils/compile_cache.py)
jax.config.update("jax_include_full_tracebacks_in_locations", False)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_cpu_state():
    """XLA:CPU segfaults after enough distinct compiled executables
    accumulate in one process (reproducible ~30 tests into the
    banded-heavy 4-file suite, in backend_compile_and_load, with RAM
    free and the persistent cache disabled; each file passes alone).
    Dropping jax's in-memory caches at module boundaries bounds that
    state; within-module cache reuse keeps the suite fast."""
    yield
    jax.clear_caches()

# --- smoke tier -------------------------------------------------------
# One representative path through every subsystem, <10 min total on the
# 1-core host (the full suite is ~1h15). Curated here rather than as
# per-file decorators so the tier stays visible in one place.
# Run with: python -m pytest tests/ -m smoke -q
_SMOKE_IDS = {
    "test_formula.py::test_mixed_fixed_and_random",
    "test_basis.py::TestOsplines::test_local_poly_inside_interval",
    "test_basis.py::TestSGP::test_Q_symmetric_positive",
    "test_basis.py::TestPriorConversion::test_iwp_closed_form",
    "test_objective.py::test_hessian_matches_autodiff[Poisson]",
    "test_objective.py::test_coxph_vectorized_matches_loops",
    "test_objective.py::test_cc_vectorized_matches_loops",
    "test_band_kernels.py::test_factor_solves_vs_numpy[40-2]",
    "test_band_kernels.py::test_dd_under_jit",
    "test_block_tridiag.py::test_cholesky_and_solve[12-3-4]",
    "test_block_tridiag.py::test_arrowhead",
    "test_band_batched.py::test_batched_factor_and_solves[40-2-3]",
    "test_banded_generic.py::test_sgp_driver_nll_matches_dense",
    "test_fast_iwp.py::test_laplace_nll_matches_dense[Poisson-3-12]",
    "test_fast_iwp.py::test_full_fit_matches_dense_path",
    "test_fast_batched.py::test_packed_fused_fits_match_scalar",
    "test_data_sharded.py::test_sharded_fused_fit_matches_single_device",
    "test_golden_covid.py::test_native_fit_golden",
    "test_mcmc.py::test_mcmc_fast_val_grad_consistent[Poisson]",
    "test_nuts.py::test_nuts_gaussian_target_moments",
    "test_native.py::test_osp_local_poly_matches_numpy",
    "test_packed_nodes.py::test_packed_matches_sequential_poisson",
    "test_parallel_loop.py::test_parallel_loop_matches_sequential",
    "test_partial_likelihood.py::test_coxph_end_to_end",
    "test_reparam.py::test_transform_T_matches_scipy[True-3]",
    "test_reparam.py::test_sparse_design_matches_dense_basis[1]",
    "test_replicates.py::test_replicates_match_single_fits",
    "test_serialize.py::test_roundtrip",
    "test_sgp_integration.py::test_sgp_recovers_cycle",
    "test_customized.py::test_customized_random_effect",
    "test_fused_sampling.py::test_fused_sampling_fast_backend",
    "test_compile_cache.py::test_flag_is_set",
    "test_multichip.py::test_entry_compiles",
    "test_robustness.py::test_guarded_band_factor_finite_on_indefinite[order_one_negative]",
    "test_robustness.py::test_chol_guarded_escalation",
    "test_robustness.py::test_opt_nd_budget_exhaustion_falls_back",
    "test_scatter_iid.py::test_nll_and_grad_match_banded[Poisson]",
    "test_prog_cache.py::test_store_load_across_processes",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        # item.nodeid is like "tests/test_x.py::test_y"
        nid = item.nodeid.split("/")[-1]
        if nid in _SMOKE_IDS:
            item.add_marker(pytest.mark.smoke)
