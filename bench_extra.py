"""Secondary on-chip benchmarks (not the driver's headline — that is
bench.py). Mirrors BASELINE.md's other configs:

  gauss2   n=1e5, k=2000 IWP3, Gaussian family -> s=2 hyperparameters
           (smoothing + noise): the fused s>1 AGHQ path
           (inference/aghq.build_fused_opt_nd / build_fused_nodes).
  lynx     small sGP+IID Poisson model (lynx-scale): dispatch-bound
           regime where fused programs matter most.
  reps     R replicate responses on the headline design, lax.map'd on
           ONE chip (the per-chip half of the BASELINE stretch config;
           across-chip sharding is parallel/replicates.py).
  reps_packed  R replicates through ONE lane-packed batched program
           (fast/batched.py): every band factorization/solve advances
           all replicates at once.

Usage: python bench_extra.py [gauss2|lynx|reps|reps_packed]
(default: all)
Prints one JSON line per config to stdout.
"""
import json
import sys
import time

import numpy as np
import jax

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
# Caller-independent cache keys (see utils/compile_cache.py)
jax.config.update("jax_include_full_tracebacks_in_locations", False)


def _build_iwp(n, k, family, seed=0):
    from bayesgp_tpu import terms as T
    from bayesgp_tpu.model import build as B
    from bayesgp_tpu.fast.iwp import build_fast_iwp

    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0.0, 365.0, n))
    f_true = 1.5 + 0.8 * np.sin(2 * np.pi * x / 90.0) + 0.002 * x
    if family == "Gaussian":
        y = f_true + 0.3 * rng.normal(size=n)
    else:
        y = rng.poisson(np.exp(f_true)).astype(np.float64)
    inst = T.build_iwp_term("x", x, order=3, k=k, materialize_B=False)
    dmf = [np.ones((n, 1))]
    md = B.build_model_data([inst], dmf, y, family, dense_design=False)
    xf = np.concatenate([inst.X] + dmf, axis=1)
    pt = np.full(xf.shape[1], 0.01)
    return build_fast_iwp(inst, md, xf, pt, np.zeros_like(pt),
                          inst.x_data, dtype=np.float32)


def bench_gauss2():
    from bayesgp_tpu.inference.aghq import aghq_fit
    be = _build_iwp(100_000, 2000, "Gaussian")
    t0 = time.time()
    fit = aghq_fit(be, k=4)
    first = time.time() - t0
    t0 = time.time()
    fit = aghq_fit(be, k=4)
    dt = time.time() - t0
    # Laplace-value noise audit (VERDICT r4 #5): model_fit_loop
    # EXPONENTIATES lognormconst/Laplace-nll differences across grid
    # fits (reference R/02_model_fit.R:771-776). Same-input refits are
    # deterministic, so the honest noise proxy is WARM-STATE
    # path-dependence: evaluate the nll at the SAME theta (the mode)
    # from k+1 different inner-solver starting states — each converges
    # its own f32-noise-floor W*, exactly like neighbouring grid
    # points do. Spread in nats (pre-fix: the +-4-nat f32 pit; the
    # split-f32 likelihood accumulation is the lever).
    import jax.numpy as _jnp
    th = _jnp.asarray(fit.mode, be.dtype)
    vals = [float(be.nll_warm(th, be.init_state())[0])]
    try:
        # warm states from NEIGHBOURING thetas (grid spacing ~0.5-1):
        # each perturbed eval converges its own f32-noise-floor W*,
        # then the mode is re-evaluated FROM that state — the exact
        # path-dependence neighbouring model_fit_loop grid points see.
        for dth in (0.5, -0.5, 1.0, -1.0):
            _, st_p = be.nll_warm(th + dth, be.init_state())
            vals.append(float(be.nll_warm(th, st_p)[0]))
    except Exception as e:                      # noqa: BLE001
        print(json.dumps({"metric": "gauss2_noise_audit_note",
                          "note": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)
    spread = float(np.max(vals) - np.min(vals))
    print(json.dumps({"metric": "gauss2_n1e5_k2000_s2_aghq_fit_seconds",
                      "value": round(dt, 4), "unit": "s",
                      "first_compile_s": round(first, 1),
                      "mode": np.asarray(fit.mode).tolist(),
                      "lognormconst": round(fit.lognormconst, 3)}),
          flush=True)
    print(json.dumps({"metric": "gauss2_laplace_value_noise_nats",
                      "value": round(spread, 4), "unit": "nats",
                      "samples": [round(v, 4) for v in vals]}),
          flush=True)


def bench_lynx():
    import bayesgp_tpu as bg
    lynx = bg.datasets.lynx()
    data = {"year": lynx["year"], "y": lynx["count"],
            "idx": np.arange(len(lynx["year"]), dtype=float)}
    f = ("y ~ f(x=year, model='sGP', a=a_val, k=30) "
         "+ f(x=idx, model='IID', "
         "sd_prior=dict(prior='exp', param=dict(u=1, alpha=0.01)))")

    def run():
        return bg.model_fit(f, data=data, family="Poisson", M=1000,
                            seed=0, engine="banded",
                            env={"a_val": 2 * np.pi / 10})
    t0 = time.time()
    fit = run()
    first = time.time() - t0
    t0 = time.time()
    fit = run()
    dt = time.time() - t0
    print(json.dumps({"metric": "lynx_sgp_iid_fit_seconds",
                      "value": round(dt, 4), "unit": "s",
                      "first_compile_s": round(first, 1),
                      "mode": np.asarray(fit.mod.mode).tolist()}),
          flush=True)


def _replicate_ys(be, R, seed=1):
    rng = np.random.default_rng(seed)
    base = np.asarray(be.md.y, np.float64)
    inv = np.argsort(np.asarray(be.row_order))
    lam = np.maximum(base, 0.5)
    return np.stack([rng.poisson(lam)[inv].astype(np.float64)
                     for _ in range(R)])


def bench_reps(R=4):
    from bayesgp_tpu.parallel.replicates import replicate_fits
    be = _build_iwp(100_000, 2000, "Poisson")
    ys = _replicate_ys(be, R)
    t0 = time.time()
    modes, lncs = replicate_fits(be, ys, k=4)
    first = time.time() - t0
    t0 = time.time()
    modes, lncs = replicate_fits(be, ys, k=4)
    dt = time.time() - t0
    print(json.dumps({"metric": f"replicates_R{R}_onechip_seconds",
                      "value": round(dt, 4), "unit": "s",
                      "per_fit_s": round(dt / R, 4),
                      "first_compile_s": round(first, 1),
                      "modes": np.asarray(modes).tolist()}), flush=True)


def bench_reps_packed(R=16):
    """Lane-packed replicate fits: R fits through ONE batched program
    (fast/batched.py) — the per-chip stretch configuration."""
    from bayesgp_tpu.parallel.replicates import replicate_fits_packed
    be = _build_iwp(100_000, 2000, "Poisson")
    ys = _replicate_ys(be, R)
    t0 = time.time()
    modes, lncs = replicate_fits_packed(be, ys, k=4)
    first = time.time() - t0
    t0 = time.time()
    modes, lncs = replicate_fits_packed(be, ys, k=4)
    dt = time.time() - t0
    print(json.dumps({"metric": f"replicates_packed_R{R}_onechip_seconds",
                      "value": round(dt, 4), "unit": "s",
                      "per_fit_s": round(dt / R, 4),
                      "first_compile_s": round(first, 1),
                      "modes": np.asarray(modes).tolist()}), flush=True)


def bench_lynx_once():
    """ONE lynx fit in THIS process (helper for bench_lynx_fresh)."""
    import bayesgp_tpu as bg
    lynx = bg.datasets.lynx()
    data = {"year": lynx["year"], "y": lynx["count"],
            "idx": np.arange(len(lynx["year"]), dtype=float)}
    f = ("y ~ f(x=year, model='sGP', a=a_val, k=30) "
         "+ f(x=idx, model='IID', "
         "sd_prior=dict(prior='exp', param=dict(u=1, alpha=0.01)))")
    t0 = time.time()
    fit = bg.model_fit(f, data=data, family="Poisson", M=1000,
                       seed=0, engine="banded",
                       env={"a_val": 2 * np.pi / 10})
    dt = time.time() - t0
    print(json.dumps({"metric": "lynx_once_fit_seconds",
                      "value": round(dt, 4), "unit": "s",
                      "mode": np.asarray(fit.mod.mode).tolist()}),
          flush=True)


def bench_lynx_fresh():
    """Fresh-PROCESS small-model latency (VERDICT r3 item 5): two
    subprocesses each running ONE lynx fit. The second rides the warm
    .jax_cache AND the on-disk compiled-executable cache
    (utils/prog_cache) — the reference's everyday UX is a seconds-scale
    R session fit (vignettes/BayesGP-sGP.Rmd:72-108); before the
    executable cache a fresh on-chip model_fit paid ~36 s of per-call
    trace+lower+load (BENCH_NOTES round 13)."""
    import subprocess
    times = []
    for i in range(2):
        t0 = time.time()
        p = subprocess.run([sys.executable, __file__, "lynx_once"],
                           capture_output=True, text=True, timeout=3000)
        wall = time.time() - t0
        lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
        fit_s = json.loads(lines[-1])["value"] if lines else -1.0
        times.append({"process": i, "fit_s": fit_s,
                      "process_wall_s": round(wall, 1)})
    print(json.dumps({"metric": "lynx_fresh_process_fit_seconds",
                      "value": times[-1]["fit_s"], "unit": "s",
                      "runs": times}), flush=True)


def bench_coxph(n=4000):
    """BASELINE.json config 3: Cox partial-likelihood survival model
    with an IWP smooth (Partial_Likelihood vignette shape, scaled up).
    Full-Hessian family -> dense backend; the suffix-logcumsumexp
    objective replaces the reference's O(n^2) risk-set loops."""
    import bayesgp_tpu as bg
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

    def run():
        return bg.model_fit(fml, data=data, family="Coxph", cens="cens",
                            M=1000, seed=0)
    t0 = time.time()
    fit = run()
    first = time.time() - t0
    t0 = time.time()
    fit = run()
    dt = time.time() - t0
    print(json.dumps({"metric": f"coxph_n{n}_iwp_fit_seconds",
                      "value": round(dt, 4), "unit": "s",
                      "first_compile_s": round(first, 1),
                      "mode": np.asarray(fit.mod.mode).tolist()}),
          flush=True)


def bench_cc():
    """Case-crossover conditional likelihood on sim1data (the
    Partial_Likelihood vignette model) — driver-style on-chip number
    for the last family without one (VERDICT round-2 item 9). Full-
    Hessian family -> dense backend; reference counterpart
    src/BayesGP.cpp:196-210."""
    import bayesgp_tpu as bg
    data = bg.datasets.sim1data()
    med = float(np.median(data["exposure"]))
    fml = ("case ~ f(x=exposure, model='IWP', order=2, k=30, "
           f"initial_location={med})")

    def run():
        return bg.model_fit(fml, data=data, family="cc",
                            strata="subject", method="aghq", M=1000,
                            seed=0)
    t0 = time.time()
    fit = run()
    first = time.time() - t0
    t0 = time.time()
    fit = run()
    dt = time.time() - t0
    print(json.dumps({"metric": "cc_sim1data_fit_seconds",
                      "value": round(dt, 4), "unit": "s",
                      "first_compile_s": round(first, 1),
                      "mode": np.asarray(fit.mod.mode).tolist()}),
          flush=True)


def bench_two_smooths(n=20000, k=100):
    """BASELINE.json config 4: Gaussian family, IWP + sGP smooths with
    k=100 each -> s=3 hyperparameters (two smoothing + noise), fused
    multi-dimensional AGHQ grid."""
    import bayesgp_tpu as bg
    rng = np.random.default_rng(1)
    x = np.sort(rng.uniform(0.0, 100.0, n))
    season = 0.6 * np.sin(2 * np.pi * x / 10.0)
    trend = 0.02 * x + 0.4 * np.sin(x / 15.0)
    y = trend + season + 0.3 * rng.normal(size=n)
    data = {"x": x, "xs": x.copy(), "y": y}
    fml = ("y ~ f(x=x, model='IWP', order=2, k=k_iwp) "
           "+ f(x=xs, model='sGP', period=10, k=k_sgp)")

    def run():
        return bg.model_fit(fml, data=data, family="Gaussian", M=1000,
                            seed=0, aghq_k=3,
                            env={"k_iwp": k, "k_sgp": k})
    t0 = time.time()
    fit = run()
    first = time.time() - t0
    t0 = time.time()
    fit = run()
    dt = time.time() - t0
    print(json.dumps({"metric": f"two_smooths_n{n}_k{k}_s3_fit_seconds",
                      "value": round(dt, 4), "unit": "s",
                      "first_compile_s": round(first, 1),
                      "mode": np.asarray(fit.mod.mode).tolist()}),
          flush=True)


def bench_build():
    """Host-side model construction at the headline config (n=1e5,
    k=2000 IWP3) and a large-sGP config (k=400, m=2, region 400) —
    all NumPy/SciPy, no accelerator."""
    t0 = time.time()
    _build_iwp(100_000, 2000, "Poisson")
    dt_iwp = time.time() - t0
    from bayesgp_tpu import terms as T
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0.0, 400.0, 100_000))
    t0 = time.time()
    T.build_sgp_term("x", x, a=2 * np.pi / 10, k=400, m=2,
                     region=(0.0, 400.0), materialize_B=False)
    dt_sgp = time.time() - t0
    print(json.dumps({"metric": "host_model_build_seconds",
                      "value": round(dt_iwp, 3), "unit": "s",
                      "sgp_k400_m2_build_s": round(dt_sgp, 3)}),
          flush=True)


def bench_predict(n_pred=100_000, M=3000):
    """Production-scale predict on the covid-style IWP3 fit: n_pred
    locations x M draws, mean + 95% interval. Exercises the
    single-dispatch device path (postfit._summarize_iwp_device_blocks:
    O-spline design built ON device; only the x vector + samples cross
    the host link)."""
    import bayesgp_tpu as bg
    from bayesgp_tpu.inference.aghq import aghq_fit
    from bayesgp_tpu.inference import sampling as S

    be = _build_iwp(100_000, 2000, "Poisson")
    key = jax.random.PRNGKey(0)
    fit = aghq_fit(be, k=4, sample=(key, M))
    samps, _, _ = S.sample_marginal(key, fit, M)
    # package a minimal FitResult-like predict via the public surface
    from bayesgp_tpu import postfit
    import math as _m
    term = be.term
    d = term.num_basis
    coefs = samps[:d, :]
    g = np.vstack([np.zeros((1, M)), samps[d:d + term.order - 1, :]])
    xs = np.linspace(0.0, 365.0, n_pred)
    X = postfit.osplines.global_poly_helper(xs, p=term.order)
    t0 = time.time()
    mean, lo, hi = postfit._summarize_iwp_device_blocks(
        term.knots, xs, term.order, coefs, X, g, 0.95,
        rows=max(1, postfit._PREDICT_CHUNK_ELEMS // M))
    first = time.time() - t0
    t0 = time.time()
    mean, lo, hi = postfit._summarize_iwp_device_blocks(
        term.knots, xs, term.order, coefs, X, g, 0.95,
        rows=max(1, postfit._PREDICT_CHUNK_ELEMS // M))
    steady = time.time() - t0
    ok = bool(np.all(np.isfinite(mean)) and np.all(lo <= hi))
    print(json.dumps({"metric": "predict_1e5x3000_summary_seconds",
                      "value": round(steady, 4), "unit": "s",
                      "first_s": round(first, 3), "finite": ok}),
          flush=True)


def bench_bigiid(n=100_000, k=2000, q=10_000, engine="auto"):
    """Large-q IID: n=1e5 observations, IWP3 k=2000 driver + an IID
    term with q=1e4 x-clustered levels (observation-bin random effect —
    the overdispersion pattern), Poisson, s=2 AGHQ fit. The merged-IID
    band path (fast/banded._merge_iid_into_band); the reference rides
    CHOLMOD's sparse Cholesky here (R/02_model_fit.R:276-284). Before
    round 13 this configuration was O(n q + d q^2 + q^3) dense-tail
    infeasible."""
    import bayesgp_tpu as bg
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0.0, 365.0, n))
    g = np.floor(x * (q / 365.0))
    g = np.minimum(g, q - 1)
    u_true = 0.15 * rng.normal(size=int(g.max()) + 1)
    f_true = 1.5 + 0.8 * np.sin(2 * np.pi * x / 90.0) + 0.002 * x
    y = rng.poisson(np.exp(f_true + u_true[g.astype(int)])).astype(float)
    data = {"y": y, "x": x, "g": g}
    fml = "y ~ f(x, model='IWP', order=3, k=kk) + f(g, model='IID')"

    def run():
        return bg.model_fit(fml, data=data, family="Poisson", M=1000,
                            seed=0, aghq_k=3, env={"kk": k},
                            engine=engine)
    t0 = time.time()
    fit = run()
    first = time.time() - t0
    t0 = time.time()
    fit = run()
    dt = time.time() - t0
    iid_lazy = any(t.kind == "IID" and t.B is None for t in fit.instances)
    tag = "" if engine == "auto" else f"_{engine}"
    print(json.dumps({"metric": f"bigiid_n{n}_k{k}_q{q}{tag}_fit_seconds",
                      "value": round(dt, 4), "unit": "s",
                      "first_compile_s": round(first, 1),
                      "merged_band": bool(iid_lazy),
                      "mode": np.asarray(fit.mod.mode).tolist()}),
          flush=True)


def bench_scattered_iid(n=50_000, k=500):
    """Scattered (non-x-clustered) large-q IID: the regime CHOLMOD's
    fill-reducing orderings handle generically and the merged-band path
    cannot (levels span the whole x range). Two engines per q:
      - dense tail (engine='banded'): O(n q + d q^2 + q^3), ceiling
        q<=4000;
      - diag-first Schur (engine='scatter_iid', fast/scatter_iid.py):
        the IID Hessian block is diagonal, eliminate it first, factor
        one dense (d+qf) Schur on the MXU — any grouping, any q.
    q=10000 runs scatter_iid only (the dense tail raises there).
    Each q is a separate model; steady = second fit."""
    import bayesgp_tpu as bg
    rows = []
    # scatter_iid points FIRST: the dense-tail (banded) q>=512 points
    # are in the known v5-lite worker-crash regime (dense arrow tails,
    # round-13/15 landmine) — a fault there must not cost the scatter
    # numbers, which are the production path for this regime
    for q, engines in ((512, ("scatter_iid",)),
                       (2048, ("scatter_iid",)),
                       (10_000, ("scatter_iid",)),
                       (512, ("banded",)),
                       (2048, ("banded",))):
        rng = np.random.default_rng(0)
        x = np.sort(rng.uniform(0.0, 365.0, n))
        g = rng.integers(0, q, n).astype(float)      # scattered!
        u_true = 0.1 * rng.normal(size=q)
        f_true = 1.2 + 0.6 * np.sin(2 * np.pi * x / 90.0)
        y = rng.poisson(np.exp(f_true + u_true[g.astype(int)])
                        ).astype(float)
        data = {"y": y, "x": x, "g": g}
        fml = "y ~ f(x, model='IWP', order=3, k=kk) + f(g, model='IID')"
        for eng in engines:
            def run():
                return bg.model_fit(fml, data=data, family="Poisson",
                                    M=500, seed=0, aghq_k=3,
                                    env={"kk": k}, engine=eng)
            t0 = time.time()
            fit = run()
            first = time.time() - t0
            t0 = time.time()
            fit = run()
            dt = time.time() - t0
            rows.append({"q": q, "engine": eng, "steady_s": round(dt, 3),
                         "first_s": round(first, 1)})
            print(json.dumps(
                {"metric": f"scattered_iid_q{q}_{eng}_fit_seconds",
                 "value": round(dt, 4), "unit": "s",
                 "first_compile_s": round(first, 1),
                 "mode": np.asarray(fit.mod.mode).tolist()}),
                flush=True)
    print(json.dumps({"metric": "scattered_iid_crossover",
                      "value": rows[-1]["steady_s"], "unit": "s",
                      "curve": rows}), flush=True)


def bench_fitpredict(n_pred=100_000, M=3000):
    """One-dispatch fit + posterior draws + predict summaries
    (aghq_fit predict=) vs the same work as fit-then-predict (two
    dispatches) at the headline config."""
    from bayesgp_tpu.inference.aghq import aghq_fit

    be = _build_iwp(100_000, 2000, "Poisson")
    key = jax.random.PRNGKey(0)
    xs = np.linspace(0.0, 365.0, n_pred)
    spec = {"knots": be.term.knots, "p": be.term.order, "degree": 0,
            "level": 0.95, "include_intercept": True, "rows": 1024}

    def run():
        return aghq_fit(be, k=4, sample=(key, M), predict=(spec, xs))
    t0 = time.time()
    fit = run()
    first = time.time() - t0
    t0 = time.time()
    fit = run()
    dt = time.time() - t0
    pre = fit.prepredicted
    ok = bool(np.all(np.isfinite(pre["mean"]))
              and np.all(pre["plower"] <= pre["pupper"]))
    print(json.dumps({"metric": "fit_sample_predict_onedispatch_seconds",
                      "value": round(dt, 4), "unit": "s",
                      "first_compile_s": round(first, 1),
                      "n_pred": n_pred, "M": M, "finite": ok}),
          flush=True)


def bench_mcmc(M=200, warmup=300):
    """Fast-backend NUTS at the headline config (n=1e5, k=2000): the
    production-scale method='MCMC' path (mcmc.mcmc_fit_fast — O(n)
    design products per leapfrog, no factorizations). Short chain: the
    metric is sampling THROUGHPUT (leapfrog steps/second), not a
    converged posterior."""
    from bayesgp_tpu.inference import mcmc as mcmc_mod

    be = _build_iwp(100_000, 2000, "Poisson")
    opts = {"warmup": warmup, "chains": 1, "seed": 1}
    t0 = time.time()
    mod, samps, theta_samps = mcmc_mod.mcmc_fit_fast(be, M=M,
                                                     options=opts)
    wall = time.time() - t0
    nleap = float(np.asarray(mod["mean_leapfrogs"]).mean())
    total_leaps = nleap * (M + warmup)
    ok = bool(np.all(np.isfinite(samps)))
    print(json.dumps({"metric": "mcmc_fast_leapfrogs_per_second",
                      "value": round(total_leaps / wall, 1),
                      "unit": "steps/s", "wall_s": round(wall, 1),
                      "mean_leapfrogs": round(nleap, 1),
                      "accept": round(float(np.asarray(
                          mod["accept_rate"]).mean()), 3),
                      "finite": ok}), flush=True)


def _guarded(name, fn):
    """Run one config under the framework worker-crash guard
    (utils/tpu_guard): a faulting program emits an honest value=-1
    JSON line and the worker is probe-recovered so the REST of the
    sweep still measures on a healthy worker (round-13 lesson: one
    crash poisoned every subsequent number)."""
    from bayesgp_tpu.utils import tpu_guard
    try:
        tpu_guard.run_guarded(fn)
    except tpu_guard.WorkerCrash as e:
        cause = e.__cause__
        print(json.dumps({"metric": f"{name}", "value": -1, "unit": "s",
                          "error": str(e)[:300],
                          "cause": (f"{type(cause).__name__}: {cause}"
                                    [:600] if cause else None),
                          "worker_recovered": e.recovered}), flush=True)
    except Exception as e:                      # noqa: BLE001
        print(json.dumps({"metric": f"{name}", "value": -1, "unit": "s",
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)


_CONFIGS = [
    ("host_model_build", "build", bench_build),
    ("predict_1e5x3000_summary", "predict", bench_predict),
    ("fit_sample_predict_onedispatch", "fitpredict", bench_fitpredict),
    ("bigiid_merged_band", "bigiid", bench_bigiid),
    ("scattered_iid_crossover", "scattered_iid", bench_scattered_iid),
    ("coxph_iwp", "coxph", bench_coxph),
    ("cc_sim1data", "cc", bench_cc),
    ("two_smooths_s3", "two_smooths", bench_two_smooths),
    ("gauss2_s2", "gauss2", bench_gauss2),
    ("lynx_sgp_iid", "lynx", bench_lynx),
    ("lynx_fresh_process", "lynx_fresh", bench_lynx_fresh),
    ("replicates", "reps", bench_reps),
    ("replicates_packed", "reps_packed", bench_reps_packed),
    ("replicates_packed_R64", "reps_packed64",
     lambda: bench_reps_packed(R=64)),
]

def _run_all_isolated():
    """Run every config in its OWN subprocess with a watchdog. A TPU
    worker fault kills at most that config's process: the in-process
    client of a crashed worker is not reliably recoverable (round-14
    measurement: probe/retry from the faulted process kept failing),
    while a fresh process reconnects once the worker clears. Between
    configs a bounded subprocess probe waits for worker health."""
    import subprocess
    import time as _t

    def _probe_ok(timeout=120):
        code = ("import jax, jax.numpy as jnp;"
                "print(float(jnp.arange(8.0).sum()))")
        try:
            p = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, timeout=timeout)
            return p.returncode == 0 and b"28.0" in p.stdout
        except subprocess.TimeoutExpired:
            return False

    for name, key, _fn in _CONFIGS:
        for attempt in range(6):
            if _probe_ok():
                break
            _t.sleep(30 * (attempt + 1))
        try:
            p = subprocess.run([sys.executable, __file__, key],
                               timeout=5400)
            if p.returncode != 0:
                print(json.dumps({"metric": name, "value": -1,
                                  "unit": "s",
                                  "error": f"subprocess rc={p.returncode}"
                                  }), flush=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({"metric": name, "value": -1, "unit": "s",
                              "error": "watchdog timeout (5400 s)"}),
                  flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which == "all":
        _run_all_isolated()
    elif which == "mcmc":   # opt-in: long even on-chip
        _guarded("mcmc_fast", bench_mcmc)
    elif which == "lynx_once":
        _guarded("lynx_once", bench_lynx_once)
    elif which == "bigiid_scatter":
        # x-clustered q=1e4 through the diag-first Schur engine: the
        # merged-band program crashes the v5-lite worker (rounds 13/15)
        # — the dense (d+qf) Schur factor avoids the giant band
        _guarded("bigiid_scatter",
                 lambda: bench_bigiid(engine="scatter_iid"))
    else:
        for name, key, fn in _CONFIGS:
            if which == key:
                _guarded(name, fn)
