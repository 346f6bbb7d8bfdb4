"""Host-only diagnosis of the CoxPH on-chip compile pathology.

Round-15 measurement: `bench_extra.py coxph` (n=4000, IWP2 k=30) spent
>20 min inside server-side XLA compile (stack in
backend_compile_and_load, host CPU idle) — twice. This tool lowers the
EXACT fused s=1 program for platform 'tpu' on the CPU host
(cross-lowering works here incl. Pallas — BENCH_NOTES round 7) and
reports the StableHLO size per variant, so the compile bomb can be
bisected WITHOUT burning tunnel time. For scale: the headline
n=1e5/k=2000 program is ~12 MB StableHLO and compiles in ~420 s.

Usage: python tools/coxph_lowering.py [n]
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_include_full_tracebacks_in_locations", False)
sys.path.insert(0, "/root/repo")


def build_backend(n=4000):
    import bayesgp_tpu as bg
    from bayesgp_tpu.inference import aghq as aghq_mod

    rng = np.random.default_rng(0)
    age = rng.uniform(20, 80, n)
    sex = rng.integers(0, 2, n).astype(float)
    lam = np.exp(0.3 * np.sin(age / 8.0) - 0.8 * sex)
    t_ev = rng.exponential(1.0 / lam)
    t_c = rng.exponential(2.0 / lam.mean(), n)
    time_obs = np.minimum(t_ev, t_c)
    cens = (t_ev <= t_c).astype(float)
    data = {"time": time_obs, "age": age, "sex": sex, "cens": cens}
    fml = "time ~ sex + f(x=age, model='IWP', order=2, k=30)"

    captured = {}
    real = aghq_mod.aghq_fit

    def grab(backend, **kw):
        captured["backend"] = backend
        raise _Stop()

    class _Stop(Exception):
        pass

    aghq_mod.aghq_fit = grab
    try:
        bg.model_fit(fml, data=data, family="Coxph", cens="cens",
                     M=1000, seed=0)
    except _Stop:
        pass
    finally:
        aghq_mod.aghq_fit = real
    return captured["backend"]


def lower_size(be, k=4, sample_M=1000, max_iter=40, label=""):
    from bayesgp_tpu.inference.aghq import build_fused_run_1d
    import jax.numpy as jnp

    th0 = jnp.asarray(0.0, be.dtype)
    args = (th0, be.init_state())
    if sample_M:
        args = args + (jax.random.PRNGKey(0),)
    if hasattr(be, "device_args"):          # the lifted program form
        arrs0 = be.device_args()

        def fn(arrs, *a):
            return build_fused_run_1d(be.rebind(arrs), k, 1e-9,
                                      max_iter, jit=False,
                                      sample_M=sample_M)(*a)
        args = (arrs0,) + args
    else:
        fn = build_fused_run_1d(be, k, 1e-9, max_iter, jit=False,
                                sample_M=sample_M)
    t0 = time.time()
    lowered = jax.jit(fn).trace(*args).lower(
        lowering_platforms=("tpu",))
    hlo = lowered.as_text()
    dt = time.time() - t0
    print(f"{label or 'program'}: lower={dt:.1f}s "
          f"stablehlo={len(hlo)/1e6:.2f} MB", flush=True)
    return hlo


def main(n=4000):
    be = build_backend(n)
    print(f"backend={type(be).__name__} n_theta={be.n_theta}",
          flush=True)
    hlo = lower_size(be, label=f"coxph n={n} fused k=4 M=1000")
    # what dominates? count the expensive op families
    for pat in ("stablehlo.while", "stablehlo.sort", "stablehlo.scatter",
                "stablehlo.gather", "stablehlo.reduce_window",
                "stablehlo.dot_general", "stablehlo.exponential",
                "stablehlo.log_plus_one", "stablehlo.logistic",
                "tpu_custom_call"):
        c = hlo.count(pat)
        if c:
            print(f"  {pat}: {c}", flush=True)


if __name__ == "__main__":
    main(int(float(sys.argv[1])) if len(sys.argv) > 1 else 4000)
