"""Cross-process compile-cache stability: the serialized fused-fit
program must not depend on the CALLER's Python context.

jax's persistent-cache key strips debug info from the outer StableHLO,
but Pallas kernels serialize into tpu_custom_call backend_config
payloads at lowering time WITH locations; under the default
jax_include_full_tracebacks_in_locations=True those locations embed the
caller's whole Python stack, so byte-identical fits from different
scripts (or even different call sites in one script) hash to different
cache keys and silently recompile (~330 s each at headline scale —
measured round 10, see utils/compile_cache.py). conftest.py sets the
flag False; this test pins that the lowered program is then identical
from two distinct call sites."""
import hashlib

import numpy as np
import jax
import jax.numpy as jnp

import bayesgp_tpu  # noqa: F401  (registers nothing, but mirrors usage)
from bayesgp_tpu import terms as T
from bayesgp_tpu.model import build as B
from bayesgp_tpu.fast.iwp import (build_fast_iwp, backend_device_args,
                                  backend_rebind)
from bayesgp_tpu.inference.aghq import build_fused_run_1d


def _tiny_backend(seed=0):
    rng = np.random.default_rng(seed)
    n, k = 400, 12
    x = np.sort(rng.uniform(0.0, 10.0, n))
    y = rng.poisson(np.exp(0.3 * np.sin(x) + 0.5)).astype(np.float64)
    inst = T.build_iwp_term("x", x, order=3, k=k)
    dmf = [np.ones((n, 1))]
    md = B.build_model_data([inst], dmf, y, "Poisson")
    xf = np.concatenate([inst.X] + dmf, axis=1)
    prior_tail = np.full(xf.shape[1], 0.01)
    return build_fast_iwp(inst, md, xf, prior_tail,
                          np.zeros_like(prior_tail), inst.x_data)


def _lower_text(backend, platforms=None):
    arrs0 = jax.tree_util.tree_map(jnp.asarray,
                                   backend_device_args(backend))

    def _run(arrs, *a):
        be = backend_rebind(backend, arrs)
        return build_fused_run_1d(be, 4, 1e-9, 40, jit=False)(*a)

    th0 = jnp.zeros((), backend.dtype)
    st = backend.init_state()
    traced = jax.jit(_run).trace(arrs0, th0, st)
    if platforms:
        return traced.lower(lowering_platforms=platforms).as_text()
    return traced.lower().as_text()


def test_flag_is_set():
    assert jax.config.jax_include_full_tracebacks_in_locations is False


def test_lowered_program_is_call_site_independent():
    be = _tiny_backend()

    # two DIFFERENT call sites (distinct line numbers / frames); with
    # full tracebacks in locations these produce different serialized
    # Mosaic payloads and therefore different cache keys
    def call_site_one():
        return _lower_text(be)

    def call_site_two():
        # extra frame depth on purpose
        def inner():
            return _lower_text(be)
        return inner()

    t1 = call_site_one()
    t2 = call_site_two()
    h1 = hashlib.sha256(t1.encode()).hexdigest()
    h2 = hashlib.sha256(t2.encode()).hexdigest()
    assert h1 == h2, "lowered program depends on the caller's stack"


def test_tpu_lowering_with_pallas_payloads_is_call_site_independent():
    """The real mechanism: Mosaic kernel payloads are serialized at
    LOWERING time with their locations baked in. Cross-lower for
    platform 'tpu' with the Pallas engine forced (works on the CPU
    host) from two call sites and require identical bytes.

    NOTE: at this tiny scale the caller-dependence under the DEFAULT
    flag is not reproducible (jax limits how many traceback frames
    reach locations, and here the kernel trace stack is deeper than
    the limit); the failure was reproduced and the fix verified at
    headline scale on the real build path (import-vs-__main__ of
    bench.py produced different 57 MB cache entries; with the flag the
    lowered modules are byte-identical — BENCH_NOTES round 10). This
    test pins the byte-identity INVARIANT cheaply."""
    import dataclasses as _dc
    from bayesgp_tpu.linalg import band_arrow

    be = _tiny_backend()
    eng = band_arrow.make_engine(be.dpad, be.p, be.q, be.s,
                                 force="pallas")
    be = _dc.replace(be, engine=eng)

    def call_site_one():
        return _lower_text(be, platforms=("tpu",))

    def call_site_two():
        def inner():
            return _lower_text(be, platforms=("tpu",))
        return inner()

    t1 = call_site_one()
    t2 = call_site_two()
    assert "tpu_custom_call" in t1, "expected Pallas payloads in program"
    h1 = hashlib.sha256(t1.encode()).hexdigest()
    h2 = hashlib.sha256(t2.encode()).hexdigest()
    assert h1 == h2, "Mosaic payloads depend on the caller's stack"
