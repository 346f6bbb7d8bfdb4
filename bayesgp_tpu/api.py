"""`model_fit` — the main entry point (reference: R/02_model_fit.R:309-701).

Accepts a formula string (same `f()` vocabulary as the reference) or
pre-built term objects, assembles the model, runs inference
(aghq | nlminb | MCMC), draws M posterior samples, and returns a
FitResult with the reference's sample-index partitions.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import formula as formula_mod
from . import terms as terms_mod
from .model import build as build_mod
from .inference import aghq as aghq_mod
from .inference import laplace as laplace_mod
from .inference import sampling as sampling_mod
from .postfit import FitResult


import contextlib


@contextlib.contextmanager
def _null_ctx():
    yield


def _as_dict_of_arrays(data):
    """Accept dict-of-arrays or pandas DataFrame."""
    if hasattr(data, "columns"):  # pandas
        return {c: np.asarray(data[c]) for c in data.columns}
    return {k: np.asarray(v) for k, v in data.items()}


def _normalize_control_fixed(control_fixed, fixed_names):
    """Per-coefficient N(mean, 1/prec) priors with 0.01/0 defaults
    (reference R/02_model_fit.R:586-616)."""
    cf = dict(control_fixed) if control_fixed else {}
    out = {}
    for name in fixed_names:
        ent = dict(cf.get(name, {}))
        ent.setdefault("prec", 0.01)
        ent.setdefault("mean", 0.0)
        out[name] = ent
    return out


def _normalize_control_family(control_family):
    """Gaussian-noise sd prior defaults (reference R/02_model_fit.R:75-122)."""
    if control_family is None:
        return {"sd_prior": {"prior": "exp", "param": {"u": 1.0, "alpha": 0.5}}}
    cf = dict(control_family)
    sdp = cf.get("sd_prior", cf.get("sd.prior"))
    cf["sd_prior"] = terms_mod.normalize_sd_prior(sdp)
    return cf


def assemble_model(formula=None, data=None, method: str = "aghq",
                   family: str = "Gaussian", control_family=None,
                   control_fixed=None, size=None, cens=None,
                   weight=None, strata=None, env=None,
                   customized_re=None, customized_template=None,
                   terms=None, fixed=None, response=None,
                   engine: str = "auto") -> dict:
    """Model assembly only (formula parsing, term construction, priors,
    ModelData) — the pre-inference part of `model_fit`, exposed so
    batched/sharded drivers (`model_fit_loop(parallel=True)`) can build
    per-grid-value models and run the inference themselves.

    Returns a dict with instances, md, design/prior arrays and the
    banded-path decision.
    """
    data = _as_dict_of_arrays(data)

    if formula is not None:
        parsed = formula_mod.parse_formula(formula, env)
        response = parsed.response
        fixed = parsed.fixed_effects
        re_calls = parsed.rand_effects
    else:
        if response is None:
            raise ValueError("need formula= or response=")
        fixed = list(fixed or [])
        re_calls = list(terms or [])

    family_is_coxph = family in ("Coxph", "coxph")
    family_is_cc = family in ("casecrossover", "cc", "CaseCrossover")

    # banded fast-path candidacy (decided pre-build to skip the dense B)
    fam_elementwise = family in ("Gaussian", "Poisson", "Binomial")
    def _call_model(c):
        if isinstance(c, terms_mod.TermDesign):
            return c.kind
        return c.options.get("model")
    has_banded_driver = any(_call_model(c) in ("IWP", "sGP")
                            for c in re_calls)
    candidate_banded = (engine in ("auto", "banded", "scatter_iid")
                        and method in ("aghq", "MCMC")
                        and fam_elementwise and has_banded_driver)
    if engine == "banded" and not candidate_banded:
        raise ValueError(
            "engine='banded' requires method='aghq' or 'MCMC', an "
            "elementwise family (Gaussian/Poisson/Binomial) and at "
            "least one IWP or sGP term")
    # the big (n, d) design B of IWP/sGP terms is skippable whenever the
    # banded path is a candidate: banded drivers build sparse windows
    # from x, and every other consumer (banded tail terms, the dense
    # fallback when candidacy lapses) re-materializes lazily via
    # ensure_B — so skipping is never wrong, only lazy

    if family_is_coxph:
        # reference sorts the data by the response (R/02_model_fit.R:346-350)
        order = np.argsort(data[response], kind="stable")
        data = {k: v[order] for k, v in data.items()}

    instances = []
    for call in re_calls:
        if isinstance(call, terms_mod.TermDesign):
            instances.append(call)
        else:
            # IID joins the lazy set so large-q terms (beyond
            # terms.IID_LAZY_MIN_LEVELS) skip the dense (n, q) indicator
            # and ride the banded engine's merged-IID path
            mat = not (candidate_banded
                       and _call_model(call) in ("IWP", "sGP", "IID"))
            instances.append(terms_mod.build_term_from_call(
                call, data, env=env, customized_re=customized_re,
                materialize_B=mat))

    # driver eligibility: IWP drivers need nonnegative knots
    def _driver_ok(t):
        if t.kind == "sGP":
            return t.k >= 6
        if t.kind == "IWP":
            return np.asarray(t.knots).min() >= 0
        return False
    drivers = [t for t in instances if t.kind in ("IWP", "sGP")
               and _driver_ok(t)]
    if candidate_banded and not drivers:
        if engine == "banded":
            raise ValueError(
                "engine='banded' needs an eligible driver term (sGP with "
                "k>=6 or IWP with nonnegative knots)")
        candidate_banded = False
    has_lazy_iid = any(t.kind == "IID" and t.B is None for t in instances)
    if engine == "auto":
        # dense is exact and cheap for small problems; banded wins at
        # scale — and is REQUIRED for large-q IID terms (merged-IID path)
        drv_nb = max((t.num_basis for t in drivers), default=0)
        use_banded = candidate_banded and (
            len(data[response]) * drv_nb > 2_000_000 or drv_nb > 300
            or has_lazy_iid)
    else:
        use_banded = candidate_banded and engine in ("banded",
                                                     "scatter_iid")
    if has_lazy_iid and not use_banded:
        # dense path needs the materialized indicator design after all
        for t in instances:
            if t.kind == "IID" and t.B is None:
                t.ensure_B()

    n = len(data[response])
    design_mat_fixed = []
    fixed_names = []
    if not (family_is_coxph or family_is_cc):
        design_mat_fixed.append(np.ones((n, 1)))
        fixed_names.append("intercept")
    for fe in fixed:
        design_mat_fixed.append(np.asarray(data[fe], np.float64).reshape(n, 1))
        fixed_names.append(fe)

    control_fixed_n = _normalize_control_fixed(control_fixed, fixed_names)
    control_family_n = _normalize_control_family(control_family)
    bf_prec = np.array([control_fixed_n[nm]["prec"] for nm in fixed_names])
    bf_mean = np.array([control_fixed_n[nm]["mean"] for nm in fixed_names])

    cc_arrays = None
    if family_is_cc:
        if strata is None or strata not in data:
            raise ValueError("case-crossover needs strata= naming a data column")
        w_arr = data[weight] if (weight is not None and weight in data) else None
        cc_arrays = build_mod.build_cc_strata(
            np.asarray(data[response]), np.asarray(data[strata]), w_arr)

    custom_name = ""
    if family == "Customized":
        from .model import families as fam_mod
        if customized_template is None:
            raise ValueError(
                "family='Customized' needs customized_template= (a "
                "registered family name or a loglik(eta, y, theta) callable)")
        if callable(customized_template):
            custom_name = getattr(customized_template, "__name__",
                                  "custom") + f"_{id(customized_template):x}"
            fam_mod.register_family(custom_name, customized_template)
        else:
            custom_name = str(customized_template)
            if custom_name not in fam_mod.CUSTOM_FAMILIES:
                raise ValueError(
                    f"customized family '{custom_name}' is not registered; "
                    "use bayesgp_tpu.register_family first")

    md = build_mod.build_model_data(
        instances, design_mat_fixed, np.asarray(data[response], np.float64),
        family, control_family=control_family_n,
        control_fixed_prec=bf_prec, control_fixed_mean=bf_mean,
        size=(data[size] if size else None),
        cens=(data[cens] if (cens and cens in data) else None),
        cc_arrays=cc_arrays, dense_design=not use_banded,
        custom_family=custom_name)

    theta_count = md.n_theta
    if theta_count == 0 and method != "nlminb":
        raise ValueError(
            "For model with no hyper-parameter, the method cannot be aghq or MCMC.")
    if method == "nlminb" and theta_count != 0:
        raise ValueError(
            "For model with hyper-parameter, the method should be aghq or MCMC.")

    return dict(instances=instances, md=md, use_banded=use_banded,
                design_mat_fixed=design_mat_fixed, fixed_names=fixed_names,
                bf_prec=bf_prec, bf_mean=bf_mean,
                control_family=control_family_n,
                control_fixed=control_fixed_n, family=family)


def model_fit(formula=None, data=None, method: str = "aghq",
              family: str = "Gaussian", control_family=None,
              control_fixed=None, aghq_k: int = 4, size=None, cens=None,
              weight=None, strata=None, M: int = 3000, env=None,
              customized_re=None, customized_template=None,
              option_list=None, seed: int = 0,
              terms=None, fixed=None, response=None,
              engine: str = "auto", timing: bool = False,
              data_mesh=None, theta0=None, predict_at=None) -> FitResult:
    """Fit a Bayesian hierarchical GP model.

    Either pass `formula` (string) + `data`, or `response=`/`fixed=`/
    `terms=` explicitly (terms = list of RandomEffectCall or TermDesign).
    `size`/`cens`/`weight`/`strata` name columns in `data` (Binomial /
    Coxph / case-crossover extras).

    engine: 'auto' | 'dense' | 'banded'. 'banded' is the TPU fast path
    (IWP/sGP driver term, elementwise family): sparse-row design +
    banded factorization instead of dense O(n w^2 + w^3). 'auto' picks
    it when eligible and the problem is large. With method='MCMC' the
    banded engine runs NUTS through the same O(n) primitives
    (inference/mcmc.mcmc_fit_fast) — no dense design, no
    factorizations.

    data_mesh: a 1-D `jax.sharding.Mesh` (or "auto" for one over all
    devices) to shard the OBSERVATION axis of one large fit over —
    every O(n) pass of the fused AGHQ programs runs SPMD over the mesh
    (parallel/data_sharded.py). Requires the banded/fast engine's MXU
    chunked design (method='aghq'); the reference has no single-fit
    parallelism at all (SURVEY.md section 2.3).

    timing=True attaches a per-phase wall-clock breakdown (build /
    inference / sampling) as `fit.timing` (utils.profiling.PhaseTimer;
    print `fit.timing.summary()`). The reference has no tracing story
    (SURVEY.md section 5 — TMB runs silent=TRUE).

    theta0: optional starting value(s) for the AGHQ hyperparameter
    optimization (default 0, like the reference's aghq call) — used by
    model_fit_loop to warm-start each grid fit from its neighbor's
    mode, saving the cold-start optimizer iterations.

    predict_at=(var, xs): compute predict summaries for the named GP
    component at locations `xs` AS PART OF THE FIT — on the fused fast
    path (s=1 IWP backend) the fit, posterior draws, AND the predict
    mean/95% band leave the device in ONE dispatch. Results are
    attached as fit.predictions[var] (same fields as fit.predict(var));
    a non-fusable configuration falls back to a regular post-fit
    predict so the argument always works.
    """
    if data_mesh is not None and method != "aghq":
        raise ValueError("data_mesh= requires method='aghq'")
    from .utils.profiling import PhaseTimer
    timer = PhaseTimer() if timing else None
    tphase = (timer.phase if timer is not None
              else (lambda name: _null_ctx()))

    with tphase("build (bases, priors, model data)"):
        asm = assemble_model(
            formula=formula, data=data, method=method, family=family,
            control_family=control_family, control_fixed=control_fixed,
            size=size, cens=cens, weight=weight, strata=strata, env=env,
            customized_re=customized_re,
            customized_template=customized_template, terms=terms,
            fixed=fixed, response=response, engine=engine)
    instances = asm["instances"]
    md = asm["md"]
    use_banded = asm["use_banded"]
    design_mat_fixed = asm["design_mat_fixed"]
    fixed_names = asm["fixed_names"]
    bf_prec, bf_mean = asm["bf_prec"], asm["bf_mean"]
    control_family_n = asm["control_family"]
    control_fixed_n = asm["control_fixed"]

    key = jax.random.PRNGKey(seed)
    mod = None
    samps = None
    theta_samps = None
    fused_predict = None

    def _fast_backend():
        if use_banded and len(instances) == 1 and instances[0].kind == "IWP":
            # single-IWP: the specialized reparametrized backend
            from .fast.iwp import build_fast_iwp
            inst = instances[0]
            xf_dense = np.concatenate(
                [inst.X] + [np.asarray(c) for c in design_mat_fixed],
                axis=1)
            p = inst.order
            prior_diag_tail = np.concatenate([
                np.full(p - 1, inst.boundary_prior["prec"]), bf_prec])
            prior_mean_tail = np.concatenate([
                np.full(p - 1, inst.boundary_prior["mean"]), bf_mean])
            return build_fast_iwp(inst, md, xf_dense, prior_diag_tail,
                                  prior_mean_tail, inst.x_data)
        if use_banded:
            from .fast.scatter_iid import build_scatter_iid, _Unsupported
            if engine == "scatter_iid":
                return build_scatter_iid(instances, md, design_mat_fixed,
                                         bf_prec, bf_mean)
            # sGP driver / multi-term generalized banded arrowhead
            from .fast.banded import build_banded_backend
            try:
                return build_banded_backend(instances, md,
                                            design_mat_fixed,
                                            bf_prec, bf_mean)
            except ValueError as e:
                # large-q IID whose levels are NOT x-clustered: the
                # merged-band path refuses (fast/banded span check).
                # The diag-first Schur engine handles any grouping
                # (fast/scatter_iid.py) — the reference reaches this
                # regime through CHOLMOD (R/02_model_fit.R:276-284).
                try:
                    return build_scatter_iid(instances, md,
                                             design_mat_fixed,
                                             bf_prec, bf_mean)
                except _Unsupported:
                    raise e
        return None

    if method == "aghq":
        with tphase("backend construction"):
            backend = _fast_backend()
            if backend is None:
                backend = aghq_mod.DenseBackend(md)
            if data_mesh is not None:
                from .parallel import data_sharded as ds_mod
                if isinstance(data_mesh, str):
                    if data_mesh != "auto":
                        raise ValueError("data_mesh must be a Mesh or 'auto'")
                    data_mesh = ds_mod.data_mesh()
                if getattr(backend, "chunks", None) is None:
                    raise ValueError(
                        "data_mesh= needs the fast engine's chunked "
                        "design (a large-n IWP/sGP model on "
                        "engine='banded'/'auto'); this model resolved "
                        "to " + type(backend).__name__)
                backend = ds_mod.shard_backend_data(backend, data_mesh)
        # s=1 fused backends draw the posterior samples INSIDE the fit
        # program (one dispatch total); sample_marginal reuses them.
        # predict_at=(var, xs): the predict summaries join the SAME
        # program when the backend supports it (fit + draws + predict
        # in one dispatch; reference workflow R/03_post_fit.R:44-125)
        if predict_at is not None:
            pvar, pxs = predict_at
            inst_p = [t for t in instances if t.smoothing_var == pvar]
            if (inst_p and inst_p[0].kind == "IWP"
                    and hasattr(backend, "term")
                    and backend.term is inst_p[0]):
                t_p = inst_p[0]
                xs_sorted = np.sort(np.asarray(pxs, np.float64))
                xs_sh = xs_sorted - t_p.initial_location
                spec = {"knots": t_p.knots, "p": t_p.order,
                        "degree": 0, "level": 0.95,
                        "include_intercept": not (
                            family in ("Coxph", "coxph", "cc",
                                       "casecrossover", "CaseCrossover")),
                        "rows": 1024}
                fused_predict = (pvar, xs_sorted, (spec, xs_sh))
        with tphase("inference (AGHQ fit + posterior draws)"):
            mod = aghq_mod.aghq_fit(
                backend, k=aghq_k, sample=(key, M), theta0=theta0,
                predict=(fused_predict[2] if fused_predict else None))
            samps, _, theta_samps = sampling_mod.sample_marginal(
                key, mod, M)
    elif method == "nlminb":
        with tphase("inference (MAP + Gaussian draws)"):
            theta = jnp.zeros((0,), md.A.dtype)
            Ws, H, L = jax.jit(
                lambda th: laplace_mod.laplace_mode_hess(th, md))(theta)
            mod = {"mean": np.asarray(Ws), "prec": np.asarray(H)}
            samps = sampling_mod.sample_mvn_precision(key, Ws, H, M)
            theta_samps = np.zeros((M, 0))
    elif method == "MCMC":
        with tphase("inference (NUTS)"):
            from .inference import mcmc as mcmc_mod
            opts = mcmc_mod.default_option_list(option_list)
            backend = _fast_backend()
            if backend is not None:
                # production-scale NUTS through the fast backend's O(n)
                # primitives (no dense design, no factorizations)
                mod, samps, theta_samps = mcmc_mod.mcmc_fit_fast(
                    backend, M=M, options=opts)
            else:
                mod, samps, theta_samps = mcmc_mod.mcmc_fit(md, M=M,
                                                            options=opts)
    else:
        raise ValueError(f"unknown method '{method}'")

    # --- sample-index partitions (reference R/02_model_fit.R:627-675) ---
    sum_col_ins = sum(md.d_sizes)
    random_samp_indexes = {}
    boundary_samp_indexes = {}
    off_coef = 0
    off_bdry = sum_col_ins
    for t in instances:
        dcols = t.num_basis
        random_samp_indexes[t.smoothing_var] = np.arange(off_coef, off_coef + dcols)
        off_coef += dcols
        xcols = t.X.shape[1]
        if t.kind in ("IWP", "sGP"):
            boundary_samp_indexes[t.smoothing_var] = np.arange(
                off_bdry, off_bdry + xcols)
            off_bdry += xcols
    fixed_samp_indexes = {}
    for i, nm in enumerate(fixed_names):
        fixed_samp_indexes[nm] = np.array([md.fixed_offset() + i])

    fit_result = FitResult(
        instances=instances, mod=mod, md=md, method=method, family=family,
        samps=samps, theta_samps=theta_samps,
        random_samp_indexes=random_samp_indexes,
        boundary_samp_indexes=boundary_samp_indexes,
        fixed_samp_indexes=fixed_samp_indexes,
        control_family=control_family_n, control_fixed=control_fixed_n,
        fixed_names=fixed_names, M=M, timing=timer)

    if predict_at is not None:
        pvar, pxs = predict_at
        pre = getattr(mod, "prepredicted", None)
        if method == "aghq" and fused_predict is not None and pre is not None:
            fit_result.predictions = {pvar: {
                pvar: fused_predict[1], "mean": pre["mean"],
                "plower": pre["plower"], "pupper": pre["pupper"]}}
        else:
            # non-fusable configuration: regular post-fit predict
            fit_result.predictions = {
                pvar: fit_result.predict(pvar, newdata={pvar: pxs})}
    return fit_result
