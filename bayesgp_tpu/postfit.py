"""Post-fit posterior analysis (reference layer L3, R/03_post_fit.R).

FitResult holds posterior samples + index maps; everything here works off
those cached samples — inference never re-runs (mirroring the reference,
which caches `samps` in the fit object, R/03_post_fit.R:31, 58).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

from .basis import osplines, sgp as sgp_basis
from .basis.priors import compute_d_step_sgp_sd

# posterior-draw products below this FLOP count stay in host numpy
# (dispatch overhead dominates); above it, route to the accelerator
_DEVICE_MATMUL_MIN_FLOPS = 5e9

# predict summarizes in row blocks past this many (n_pred x M) draw
# elements (~400 MB f64) instead of materializing the full matrix
_PREDICT_CHUNK_ELEMS = 50_000_000


def _post_matmul(A, Bm, min_flops=None):
    """A @ Bm for posterior-draw reconstruction, routed to the
    accelerator for production-scale products (e.g. predict over 1e5
    locations x M=3000 draws is ~1e12 FLOPs — minutes in host numpy,
    sub-second on the MXU). f32 on device: the draws carry Monte-Carlo
    error >> f32 eps. Small products and CPU-only sessions keep the
    exact host path."""
    import jax

    lim = _DEVICE_MATMUL_MIN_FLOPS if min_flops is None else min_flops
    flops = 2.0 * A.shape[0] * A.shape[1] * Bm.shape[1]
    if flops < lim or jax.default_backend() == "cpu":
        return A @ Bm
    import jax.numpy as jnp

    out = jax.jit(jnp.matmul)(jnp.asarray(A, jnp.float32),
                              jnp.asarray(Bm, jnp.float32))
    return np.asarray(out, np.float64)


def extract_mean_interval_given_samps(x, samples, level: float = 0.95):
    """Row-wise mean + pointwise quantile envelope
    (reference R/03_post_fit.R:287-296; R type-7 quantiles = numpy default).
    Returns dict with x, plower, pupper, mean."""
    alpha = 1.0 - level
    return {
        "x": np.asarray(x),
        "plower": np.quantile(samples, alpha / 2, axis=1),
        "pupper": np.quantile(samples, level + alpha / 2, axis=1),
        "mean": np.mean(samples, axis=1),
    }


_sum_linear_prog = None


def _summarize_linear_device(B, samps, X, g, level: float):
    """mean/quantile summary of X g + B samps computed ON the
    accelerator: one (rows, M) matmul + sort per chunk stays on device
    and only three (rows,) vectors transfer back (vs ~50 s of host
    np.quantile + a 48 MB transfer per 5e7-element chunk at production
    scale). R type-7 quantiles = jnp.quantile's default 'linear'
    interpolation. f32 on device: the draws carry Monte-Carlo error
    >> f32 eps (same rationale as _post_matmul).
    Returns (mean, plower, pupper) as f64 numpy."""
    import jax
    import jax.numpy as jnp

    global _sum_linear_prog
    if _sum_linear_prog is None:
        @jax.jit
        def _prog(B_, s_, X_, g_, probs):
            draws = X_ @ g_ + B_ @ s_
            qs = jnp.quantile(draws, probs, axis=1)
            return jnp.mean(draws, axis=1), qs[0], qs[1]
        _sum_linear_prog = _prog

    alpha = 1.0 - level
    probs = np.asarray([alpha / 2, level + alpha / 2], np.float32)
    mean, lo, hi = _sum_linear_prog(
        jnp.asarray(B, jnp.float32), jnp.asarray(samps, jnp.float32),
        jnp.asarray(X, jnp.float32), jnp.asarray(g, jnp.float32),
        jnp.asarray(probs))
    return (np.asarray(mean, np.float64), np.asarray(lo, np.float64),
            np.asarray(hi, np.float64))


_device_predict_progs = {}


def _bspline_basis_jnp(t_full, nbasis: int, degree: int, xs):
    """Device-side clamped B-spline design (values) at `xs`, matching
    scipy BSpline(t, eye(nbasis), degree, extrapolate=True) as used by
    basis/bsplines.eval_bspline_basis: the span index is clipped to the
    valid range, so points outside [lo, hi] evaluate the end pieces'
    polynomial extensions. Cox-de Boor basis-funs recursion (the NURBS
    book algorithm); every denominator is a positive knot difference
    for clipped spans, so no division guards are needed."""
    import jax.numpy as jnp

    t = t_full
    p = degree
    j = jnp.clip(jnp.searchsorted(t, xs, side="right") - 1, p, nbasis - 1)
    left = [None]
    right = [None]
    N = [jnp.ones_like(xs)]
    for d in range(1, p + 1):
        left.append(xs - t[j + 1 - d])
        right.append(t[j + d] - xs)
        saved = jnp.zeros_like(xs)
        Nn = []
        for r in range(d):
            temp = N[r] / (right[r + 1] + left[d - r])
            Nn.append(saved + right[r + 1] * temp)
            saved = left[d - r] * temp
        Nn.append(saved)
        N = Nn
    # place the p+1 nonzero values into the nbasis columns as p+1
    # masked rank-1 adds of (n, nbasis) — no (n, p+1, nbasis)
    # intermediate and no tiny-trailing-dim (n, p+1) stack (the
    # (n, 4, ...) layouts are a TPU compile-time landmine, CLAUDE.md)
    ar = jnp.arange(nbasis)[None, :]
    base = (j - p)[:, None]
    out = jnp.zeros((xs.shape[0], nbasis), xs.dtype)
    for r in range(p + 1):
        out = out + jnp.where(base + r == ar, N[r][:, None], 0.0)
    return out                                      # (n, nbasis)


def _ospline_basis_jnp(knots, xs, p: int):
    """Device-side O-spline design at `xs` (same values as
    osplines.get_local_poly, nonnegative knots): 0 below the left knot,
    (x-kl)^p/p! inside the interval, binomial polynomial continuation
    beyond (reference R/01_utility.R:346-364). f32 on device — predict
    draws carry Monte-Carlo error >> f32 eps."""
    import jax.numpy as jnp

    kl = knots[:-1][None, :]
    kr = knots[1:][None, :]
    dif = (knots[1:] - knots[:-1])[None, :]
    xx = xs[:, None]
    inside = jnp.clip(xx - kl, 0.0) ** p / float(math.factorial(p))
    dx = xx - kr
    tail = jnp.zeros_like(inside)
    for m in range(1, p + 1):
        tail = tail + (dif ** m) * (dx ** (p - m)) / float(
            math.factorial(m) * math.factorial(p - m))
    return jnp.where(xx <= kl, 0.0, jnp.where(xx <= kr, inside, tail))


def _summarize_design_device_blocks(key, design_fn, xs, coefs, X, g,
                                    level, rows):
    """Production-scale predict summaries in ONE device dispatch: the
    term's design matrix is built ON device per row block from the x
    values by `design_fn` (so nothing O(n_pred x basis) ever crosses
    the host link — the per-block host-built basis upload was ~130
    MB/block at headline scale), blocks run under lax.map, and only the
    (n_pred, 3) summaries come back. coefs/g are uploaded once per call
    (24 MB at k=2000, M=3000). `key` must identify design_fn's
    structure AND constants (it keys the compiled-program cache).
    Returns (mean, plower, pupper) f64.

    Accuracy matches the host-basis device path (_summarize_linear
    _device): f32 basis values cancel against the coefs, so summaries
    carry ~1e-3 absolute noise at window edges (measured on the covid
    fit; identical order for both device paths) — far below the M=3000
    Monte-Carlo error (~1e-2) these draws carry."""
    import jax
    import jax.numpy as jnp

    n_pred = len(xs)
    nb = -(-n_pred // rows)
    # pad with the last x: valid basis rows, discarded after reshape
    xs_pad = np.full(nb * rows, xs[-1], np.float32)
    xs_pad[:n_pred] = xs
    X_pad = np.zeros((nb * rows, X.shape[1]), np.float32)
    X_pad[:n_pred] = X

    ckey = (key, rows, X.shape[1])
    if ckey not in _device_predict_progs:
        # bound the cache: keys include knot-vector bytes, so sweeps
        # over many models would otherwise pin compiled programs (and
        # their captured device knot arrays) forever
        if len(_device_predict_progs) >= 32:
            _device_predict_progs.pop(next(iter(_device_predict_progs)))

        @jax.jit
        def _prog(xs_b, coefs_, X_b, g_, probs):
            def block(args):
                xb, Xb = args
                B = design_fn(xb)
                draws = Xb @ g_ + B @ coefs_
                qs = jnp.quantile(draws, probs, axis=1)
                return jnp.mean(draws, axis=1), qs[0], qs[1]

            return jax.lax.map(block, (xs_b, X_b))
        _device_predict_progs[ckey] = _prog

    alpha = 1.0 - level
    probs = np.asarray([alpha / 2, level + alpha / 2], np.float32)
    mean, lo, hi = _device_predict_progs[ckey](
        jnp.asarray(xs_pad.reshape(nb, rows)),
        jnp.asarray(coefs, jnp.float32),
        jnp.asarray(X_pad.reshape(nb, rows, X.shape[1])),
        jnp.asarray(g, jnp.float32), jnp.asarray(probs))
    return (np.asarray(mean, np.float64).ravel()[:n_pred],
            np.asarray(lo, np.float64).ravel()[:n_pred],
            np.asarray(hi, np.float64).ravel()[:n_pred])


def _summarize_iwp_device_blocks(knots, xs, p_eff, coefs, X, g, level,
                                 rows):
    """Single-dispatch IWP predict summaries: O-spline design built on
    device (_ospline_basis_jnp) per row block."""
    import jax.numpy as jnp

    knots = np.asarray(knots, np.float64)
    knots_j = jnp.asarray(knots, jnp.float32)
    key = ("iwp", p_eff, knots.tobytes())
    return _summarize_design_device_blocks(
        key, lambda xb: _ospline_basis_jnp(knots_j, xb, p_eff),
        xs, coefs, X, g, level, rows)


def _summarize_sgp_device_blocks(xs, a, kb, m, region, boundary, coefs,
                                 X, g, level, rows):
    """Single-dispatch sGP predict summaries: the sB design
    ([B cos(iax) | B sin(iax) | B] per harmonic, basis/sgp.compute_B_sB
    semantics incl. the dropind=(1,2) boundary columns) built on device
    per row block via the Cox-de Boor kernel."""
    import jax.numpy as jnp
    from .basis import bsplines

    lo_r, hi_r = float(np.min(region)), float(np.max(region))
    t_full = bsplines.bspline_knots(lo_r, hi_r, kb, 4)
    t_j = jnp.asarray(t_full, jnp.float32)

    def design(xb):
        B = _bspline_basis_jnp(t_j, kb, 3, xb)
        if boundary:
            B = B[:, 2:]
        blocks = []
        for i in range(1, m + 1):
            c = jnp.cos(i * a * xb)[:, None]
            s = jnp.sin(i * a * xb)[:, None]
            blocks += [B * c, B * s, B]
        return jnp.concatenate(blocks, axis=1)

    key = ("sgp", float(a), kb, m, lo_r, hi_r, bool(boundary))
    return _summarize_design_device_blocks(key, design, xs, coefs, X, g,
                                           level, rows)


def _iwp_design_parts(samps, global_samps, knots, refined_x, p,
                      degree: int = 0, intercept_samps=None):
    """(B, coefs, X, g) with f_draws = X g + B coefs for the IWP
    component (X/g empty when degree leaves no global part)."""
    if p <= degree:
        raise ValueError("derivative degree must be < IWP order")
    M = samps.shape[1]
    if global_samps is None:
        global_samps = np.zeros((p - 1, M))
    if global_samps.shape[0] != p - 1:
        raise ValueError("global_samps has wrong number of rows for order p")
    if intercept_samps is None:
        intercept_samps = np.zeros((1, M))
    g = np.vstack([intercept_samps, global_samps])  # (p, M)

    B = osplines.local_poly_helper(knots, refined_x, p=p - degree)
    if p - degree >= 1:
        return B, samps, _iwp_global_X(refined_x, p, degree), g[degree:p]
    return B, samps, np.zeros((len(refined_x), 0)), np.zeros((0, M))


def _iwp_global_X(xs, p, degree):
    """Global-polynomial design for the IWP posterior function at
    derivative `degree`: first p-degree monomials, factorial-rescaled
    (reference R/03_post_fit.R:229-234). Shared by the host and device
    predict paths."""
    X = osplines.global_poly_helper(xs, p=p)[:, :p - degree]
    return X * np.array([
        math.factorial(i + degree) / math.factorial(i)
        for i in range(p - degree)])[None, :]


def _sgp_global_X(xs, a, m):
    """[1 | cos/sin harmonics] global design for the sGP posterior
    function (fit coordinate system). Shared by the host and device
    predict paths."""
    return np.concatenate(
        [np.ones((len(xs), 1)),
         sgp_basis.global_poly_sgp(xs, a=a, m=m, initial_location=0.0)],
        axis=1)


def compute_post_fun_iwp(samps, global_samps, knots, refined_x, p,
                         degree: int = 0, intercept_samps=None):
    """Posterior draws of the IWP component (or its derivative) at
    refined_x (reference compute_post_fun_IWP, R/03_post_fit.R:200-241).

    f_draws = X_global . global_samps (+ intercept) + B . coef_samps with
    basis order p - degree and factorial rescaling of the monomials."""
    B, coefs, X, g = _iwp_design_parts(samps, global_samps, knots,
                                       refined_x, p, degree,
                                       intercept_samps)
    f = _post_matmul(B, coefs)
    if X.shape[1]:
        f = X @ g + f
    return np.asarray(refined_x), f


def _sgp_design_parts(samps, global_samps, k, refined_x, a, region,
                      boundary: bool = True, m: int = 1,
                      intercept_samps=None):
    """(B, coefs, X, g) with f_draws = X g + B coefs for the sGP
    component."""
    M = samps.shape[1]
    B = sgp_basis.compute_B_sB_helper(refined_x, a=a, k=k, m=m, region=region,
                                      boundary=boundary,
                                      initial_location=0.0)
    X = _sgp_global_X(refined_x, a, m)
    if intercept_samps is None:
        intercept_samps = np.zeros((1, M))
    if global_samps is None:
        global_samps = np.zeros((2 * m, M))
    g = np.vstack([intercept_samps, global_samps])
    return B, samps, X, g


def compute_post_fun_sgp(samps, global_samps, k, refined_x, a, region,
                         boundary: bool = True, m: int = 1,
                         intercept_samps=None):
    """Posterior draws of the sGP component at refined_x
    (reference compute_post_fun_sGP, R/03_post_fit.R:261-276).

    DELIBERATE DEVIATION (documented quirk): the reference re-centers
    both bases at min(refined_x) (initial_location=NULL in
    Compute_B_sB_helper/global_poly_helper_sGP), which is only
    consistent with the fit-time coordinate system when the prediction
    window starts at the training origin — a window excluding it gets a
    silently different function in the reference. Here both bases stay
    in the FIT coordinate system (refined_x is already shifted by the
    term's initial_location; no re-centering), so predictions are
    window-invariant and identical to the reference whenever
    min(refined_x) == 0 (every reference vignette/test)."""
    B, coefs, X, g = _sgp_design_parts(samps, global_samps, k, refined_x,
                                       a, region, boundary, m,
                                       intercept_samps)
    f = X @ g + _post_matmul(B, coefs)
    return np.asarray(refined_x), f


@dataclass
class FitResult:
    instances: list
    mod: Any
    md: Any
    method: str
    family: str
    samps: np.ndarray            # (w, M)
    theta_samps: np.ndarray      # (M, s)
    random_samp_indexes: dict
    boundary_samp_indexes: dict
    fixed_samp_indexes: dict
    control_family: dict
    control_fixed: dict
    fixed_names: list
    M: int
    timing: Any = None           # utils.profiling.PhaseTimer when the
    #                              fit ran with model_fit(timing=True)
    predictions: Any = None      # model_fit(predict_at=(var, xs)):
    #                              {var: predict-style dict}, computed
    #                              INSIDE the fused fit program on the
    #                              fast path (one-dispatch fit+predict)

    # ------------------------------------------------------------------
    def _instance_for(self, variable):
        hits = [t for t in self.instances if t.smoothing_var == variable]
        if len(hits) >= 2:
            raise ValueError(
                "more than one random effect shares this variable name; "
                "refit with distinct names")
        if not hits:
            raise ValueError(f"variable '{variable}' not in the fitted model")
        return hits[0]

    def predict(self, variable: str, newdata=None, degree: int = 0,
                include_intercept: bool = True, only_samples: bool = False,
                level: float = 0.95):
        """Posterior of the GP component at new locations
        (reference predict.FitResult, R/03_post_fit.R:53-125).

        NOTE (reference parity): output rows are in sorted-x order."""
        if self.family in ("Coxph", "coxph", "cc", "casecrossover",
                           "CaseCrossover"):
            include_intercept = False
        inst = self._instance_for(variable)
        gl_idx = self.boundary_samp_indexes.get(variable, np.array([], int))
        global_samps = self.samps[gl_idx, :] if len(gl_idx) else None
        coefsamps = self.samps[self.random_samp_indexes[variable], :]
        if include_intercept and "intercept" in self.fixed_samp_indexes:
            intercept_samps = self.samps[self.fixed_samp_indexes["intercept"], :]
        else:
            intercept_samps = None

        if newdata is None:
            refined_x = inst.observed_x
        else:
            col = newdata[variable] if not hasattr(newdata, "columns") \
                else newdata[variable].values
            refined_x = np.sort(np.asarray(col, np.float64)
                                - inst.initial_location)

        def post_fun(xs):
            if inst.kind == "IWP":
                return compute_post_fun_iwp(
                    coefsamps, global_samps, inst.knots, xs, inst.order,
                    degree=degree, intercept_samps=intercept_samps)
            if inst.kind == "sGP":
                return compute_post_fun_sgp(
                    coefsamps, global_samps, inst.k, xs, inst.a,
                    inst.region, boundary=inst.boundary, m=inst.m,
                    intercept_samps=intercept_samps)
            raise ValueError(f"predict not defined for {inst.kind} terms")

        def parts_fun(xs):
            if inst.kind == "IWP":
                return _iwp_design_parts(
                    coefsamps, global_samps, inst.knots, xs, inst.order,
                    degree=degree, intercept_samps=intercept_samps)
            return _sgp_design_parts(
                coefsamps, global_samps, inst.k, xs, inst.a,
                inst.region, boundary=inst.boundary, m=inst.m,
                intercept_samps=intercept_samps)

        M = coefsamps.shape[1]
        n_pred = len(refined_x)
        if only_samples:
            x, f = post_fun(refined_x)
            return x + inst.initial_location, f
        use_device = False
        if n_pred * M >= 20_000_000 and inst.kind in ("IWP", "sGP"):
            import jax
            use_device = jax.default_backend() != "cpu"
        if use_device:
            # production scale on an accelerator: draws, means and
            # quantiles all computed on device per row block; only the
            # (rows, 3) summaries come back to the host
            rows = max(1, _PREDICT_CHUNK_ELEMS // M)
            if inst.kind == "IWP" and np.min(inst.knots) >= 0:
                # single-dispatch path: the O-spline design is built ON
                # device from the x values — nothing O(n_pred x basis)
                # crosses the host link (negative-knot reflection falls
                # through to the per-block host-basis path below)
                _, coefs, X, g = parts_fun(refined_x[:1])
                mean, lo, hi = _summarize_iwp_device_blocks(
                    inst.knots, refined_x, inst.order - degree, coefs,
                    _iwp_global_X(refined_x, inst.order, degree), g,
                    level, rows)
                out = {"x": refined_x + inst.initial_location,
                       "plower": lo, "pupper": hi, "mean": mean}
                out[variable] = out.pop("x")
                return out
            if inst.kind == "sGP":
                # same single-dispatch path with the on-device sB design
                _, coefs, X, g = parts_fun(refined_x[:1])
                mean, lo, hi = _summarize_sgp_device_blocks(
                    refined_x, inst.a, inst.k, inst.m, inst.region,
                    inst.boundary, coefs,
                    _sgp_global_X(refined_x, inst.a, inst.m), g, level,
                    rows)
                out = {"x": refined_x + inst.initial_location,
                       "plower": lo, "pupper": hi, "mean": mean}
                out[variable] = out.pop("x")
                return out
            parts = []
            for i0 in range(0, n_pred, rows):
                xs_b = refined_x[i0:i0 + rows]
                B, coefs, X, g = parts_fun(xs_b)
                mean, lo, hi = _summarize_linear_device(B, coefs, X, g,
                                                        level)
                parts.append({"x": xs_b + inst.initial_location,
                              "plower": lo, "pupper": hi, "mean": mean})
            out = {key: np.concatenate([p[key] for p in parts])
                   for key in parts[0]}
        elif n_pred * M <= _PREDICT_CHUNK_ELEMS:
            x, f = post_fun(refined_x)
            out = extract_mean_interval_given_samps(
                x + inst.initial_location, f, level=level)
        else:
            # large but no accelerator: never materialize the full
            # (n_pred, M) draw matrix — evaluate and summarize in row
            # blocks (draws are recomputable from the cached samples)
            rows = max(1, _PREDICT_CHUNK_ELEMS // M)
            parts = []
            for i0 in range(0, n_pred, rows):
                x_b, f_b = post_fun(refined_x[i0:i0 + rows])
                parts.append(extract_mean_interval_given_samps(
                    x_b + inst.initial_location, f_b, level=level))
            out = {key: np.concatenate([p[key] for p in parts])
                   for key in parts[0]}
        out[variable] = out.pop("x")
        return out

    # ------------------------------------------------------------------
    def sample_fixed_effect(self, variables):
        """(M, len(variables)) samples of named fixed effects
        (reference R/03_post_fit.R:159-165)."""
        if isinstance(variables, str):
            variables = [variables]
        idx = np.concatenate([self.fixed_samp_indexes[v] for v in variables])
        return self.samps[idx, :].T

    def fixed_effects_summary(self):
        """R summary()-style table for the fixed effects
        (reference summary.FitResult, R/03_post_fit.R:30-41): rows
        1stQu/Median/Mean/3rdQu/sd per coefficient."""
        rows = {}
        for name, idx in self.fixed_samp_indexes.items():
            s = self.samps[idx[0], :]
            rows[name] = {
                "1st Qu.": float(np.quantile(s, 0.25)),
                "Median": float(np.quantile(s, 0.5)),
                "Mean": float(np.mean(s)),
                "3rd Qu.": float(np.quantile(s, 0.75)),
                "sd": float(np.std(s, ddof=1)),
            }
        return rows

    def theta_summary(self):
        """Moments/quantiles of each theta (aghq method only)."""
        from .inference.aghq import summarize_marginals, AGHQFit
        if not isinstance(self.mod, AGHQFit):
            return None
        rows = summarize_marginals(self.mod)
        names = []
        for t in self.instances:
            names.append(f"theta({t.smoothing_var})")
        # distinct keys when a custom family has 2+ extra thetas
        extra = 0
        while len(names) < len(rows):
            extra += 1
            names.append("theta(family)" if len(rows) - len(self.instances)
                         == 1 else f"theta(family{extra})")
        return dict(zip(names, rows))

    def summary(self):
        """Print a summary (reference summary.FitResult, R/03_post_fit.R:1-42).

        Format parity: the reference re-prints aghq's own summary header
        via capture.output text surgery — "AGHQ on a {s} dimensional
        posterior ...", posterior mode, log normalizing constant, and the
        R-printed quadrature covariance matrix — then the renamed
        theta table and the sample-moment fixed-effect table
        (/root/reference/README.md:73-96 shows the golden layout).
        """
        from .inference.aghq import AGHQFit
        lines = []
        if self.method == "aghq" and isinstance(self.mod, AGHQFit):
            mode = np.atleast_1d(np.asarray(self.mod.mode, float))
            s = mode.shape[0]
            lines.append(f"AGHQ on a {s} dimensional posterior with "
                         f" {self.mod.k} quadrature points")
            lines.append("")
            lines.append("The posterior mode is: "
                         + " ".join(f"{v:.6g}" for v in mode) + " ")
            lines.append("")
            lines.append("The log of the normalizing constant/marginal "
                         f"likelihood is: {self.mod.lognormconst:.7g} ")
            lines.append("")
            lines.append("The covariance matrix used for the quadrature "
                         "is...")
            L = np.atleast_2d(np.asarray(self.mod.L, float))
            cov = L @ L.T
            # R matrix print: column header row "[,j]", row labels "[i,]"
            cells = [[f"{cov[i, j]:.8g}" for j in range(s)]
                     for i in range(s)]
            widths = [max(len(f"[,{j + 1}]"),
                          max(len(cells[i][j]) for i in range(s)))
                      for j in range(s)]
            rlab = [f"[{i + 1},]" for i in range(s)]
            rw = max(len(r) for r in rlab)
            lines.append(" " * rw + " " + " ".join(
                f"[,{j + 1}]".rjust(widths[j]) for j in range(s)))
            for i in range(s):
                lines.append(rlab[i].ljust(rw) + " " + " ".join(
                    cells[i][j].rjust(widths[j]) for j in range(s)))
            lines.append("")
            lines.append("Here are some moments and quantiles for the "
                         "log precision: ")
            ts = self.theta_summary()
            hdr = f"{'':>12} {'mean':>10} {'sd':>10} {'2.5%':>10} {'median':>10} {'97.5%':>10}"
            lines.append(hdr)
            for name, r in ts.items():
                lines.append(f"{name:<12} {r['mean']:>10.6f} {r['sd']:>10.6f} "
                             f"{r['q2.5']:>10.6f} {r['median']:>10.6f} "
                             f"{r['q97.5']:>10.6f}")
        elif self.method == "aghq":
            lines.append(
                f"AGHQ on the hyperparameters with {self.mod.k} quadrature "
                f"points\nlog normalizing constant: {self.mod.lognormconst:.6f}")
        fx = self.fixed_effects_summary()
        if fx:
            lines.append("\nHere are some moments and quantiles for the "
                         "fixed effects: \n")
            hdr = f"{'':>12} {'1st Qu.':>12} {'Median':>12} {'Mean':>12} {'3rd Qu.':>12} {'sd':>12}"
            lines.append(hdr)
            for name, r in fx.items():
                lines.append(f"{name:<12} {r['1st Qu.']:>12.8f} "
                             f"{r['Median']:>12.8f} {r['Mean']:>12.8f} "
                             f"{r['3rd Qu.']:>12.8f} {r['sd']:>12.8f}")
        text = "\n".join(lines)
        print(text)
        return text

    def plot(self, variable=None, ax=None):
        """Mean + 95% interval plot per GP component
        (reference plot.FitResult, R/03_post_fit.R:127-151)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        vars_ = ([variable] if variable else
                 [t.smoothing_var for t in self.instances
                  if t.kind in ("IWP", "sGP")])
        axes = []
        for v in vars_:
            pred = self.predict(v)
            fig, a = (None, ax) if ax is not None else plt.subplots()
            a.plot(pred[v], pred["mean"], "k-", lw=2)
            a.plot(pred[v], pred["plower"], "k--", lw=1)
            a.plot(pred[v], pred["pupper"], "k--", lw=1)
            a.set_xlabel(v)
            a.set_ylabel("effect")
            axes.append(a)
        return axes

    # ------------------------------------------------------------------
    def var_density(self, component=None, h=None, theta_logprior=None):
        """Posterior/prior density of an SD parameter
        (reference var_density, R/03_post_fit.R:309-443)."""
        from .inference.aghq import compute_pdf_and_cdf, AGHQFit

        if theta_logprior is None:
            def theta_logprior(theta, prior_alpha, prior_u):
                lam = -np.log(prior_alpha) / prior_u
                return np.log(lam / 2) - lam * np.exp(-theta / 2) - theta / 2

        def priorfuncsigma(x, prior_alpha, prior_u):
            # KDE grids can extend below 0; the prior density there is 0
            xp = np.where(x > 0, x, np.nan)
            with np.errstate(invalid="ignore", divide="ignore"):
                out = (2.0 / xp) * np.exp(
                    theta_logprior(-2 * np.log(xp), prior_alpha, prior_u))
            return np.where(x > 0, out, 0.0)

        transformation = {"totheta": lambda x: -2 * np.log(x),
                          "fromtheta": lambda x: np.exp(-x / 2)}

        if isinstance(self.mod, AGHQFit):
            if component is None:
                if self.family != "Gaussian":
                    raise ValueError(
                        "no family SD in this model; pass component=")
                marg = self.mod.marginals[len(self.instances)]
                param = self.control_family["sd_prior"]["param"]
                inst = None
            else:
                i = [j for j, t in enumerate(self.instances)
                     if t.smoothing_var == component][0]
                inst = self.instances[i]
                marg = self.mod.marginals[i]
                param = inst.sd_prior["param"]
            if len(marg["theta"]) <= 2:
                raise ValueError("use aghq_k >= 3 for var_density")
            pc = compute_pdf_and_cdf(marg, transformation=transformation)
            out = {"SD": pc["transparam"], "post": pc["pdf_transparam"],
                   "prior": priorfuncsigma(pc["transparam"],
                                           param["alpha"], param["u"])}
            if component is not None:
                if h is None and inst.sd_prior.get("h") is not None:
                    h = inst.sd_prior["h"]
                if h is not None:
                    corr = _psd_correction(inst, h)
                    out["PSD"] = out["SD"] * corr
                    out["post.PSD"] = out["post"] / corr
                    out["prior.PSD"] = out["prior"] / corr
            order = np.argsort(out["SD"])
            return {k: np.asarray(v)[order] for k, v in out.items()}

        elif self.method == "MCMC":
            if component is None:
                if self.family != "Gaussian":
                    raise ValueError(
                        "no family SD in this model; pass component=")
                theta_col = len(self.instances)
                param = self.control_family["sd_prior"]["param"]
                inst = None
            else:
                i = [j for j, t in enumerate(self.instances)
                     if t.smoothing_var == component][0]
                inst = self.instances[i]
                theta_col = i
                param = inst.sd_prior["param"]
            sig = np.exp(-0.5 * self.theta_samps[:, theta_col])
            xs, ys = _kde(sig)
            out = {"SD": xs, "post": ys,
                   "prior": priorfuncsigma(xs, param["alpha"], param["u"])}
            if component is not None and inst is not None:
                if h is None and inst.sd_prior.get("h") is not None:
                    h = inst.sd_prior["h"]
                if h is not None:
                    corr = _psd_correction(inst, h)
                    out["PSD"] = out["SD"] * corr
                    out["post.PSD"] = out["post"] / corr
                    out["prior.PSD"] = out["prior"] / corr
            return out
        raise ValueError("var_density supports aghq and MCMC fits")

    def para_density(self):
        """Densities for every parameter (reference R/03_post_fit.R:450-467)."""
        out = {}
        for name in self.fixed_samp_indexes:
            s = self.sample_fixed_effect(name)[:, 0]
            xs, ys = _kde(s)
            out[name] = {"effect": xs, "post": ys}
        for t in self.instances:
            out[t.smoothing_var] = self.var_density(component=t.smoothing_var)
        if self.family == "Gaussian":
            out["family_var"] = self.var_density()
        return out

    def post_table(self, quantiles=(0.025, 0.975), digits: int = 3):
        """Posterior summary table via numerically integrated CDFs
        (reference post_table, R/03_post_fit.R:474-531)."""
        dens = self.para_density()
        rows = []

        def cdf_quantiles(x, y):
            cdf = np.cumsum(y * np.concatenate([np.diff(x), [0.0]]))
            def q(p):
                below = np.where(cdf <= p)[0]
                return x[below.max()] if len(below) else x[0]
            return q

        for name in self.fixed_samp_indexes:
            d = dens[name]
            q = cdf_quantiles(d["effect"], d["post"])
            row = {"name": name, "median": q(0.5)}
            for p in quantiles:
                row[f"q{p}"] = q(p)
            row.update({"prior": "Normal",
                        "prior:P1": self.control_fixed[name]["mean"],
                        "prior:P2": 1.0 / self.control_fixed[name]["prec"]})
            rows.append(row)
        for t in self.instances:
            d = dens[t.smoothing_var]
            if "PSD" in d:
                q = cdf_quantiles(d["PSD"], d["post.PSD"])
                nm = f"{t.smoothing_var} (PSD)"
            else:
                q = cdf_quantiles(d["SD"], d["post"])
                nm = f"{t.smoothing_var} (SD)"
            row = {"name": nm, "median": q(0.5)}
            for p in quantiles:
                row[f"q{p}"] = q(p)
            row.update({"prior": "Exponential",
                        "prior:P1": t.sd_prior["param"]["u"],
                        "prior:P2": t.sd_prior["param"]["alpha"]})
            rows.append(row)
        if "family_var" in dens:
            d = dens["family_var"]
            q = cdf_quantiles(d["SD"], d["post"])
            row = {"name": "family_var", "median": q(0.5)}
            for p in quantiles:
                row[f"q{p}"] = q(p)
            row.update({"prior": "Exponential",
                        "prior:P1": self.control_family["sd_prior"]["param"]["u"],
                        "prior:P2": self.control_family["sd_prior"]["param"]["alpha"]})
            rows.append(row)
        for row in rows:
            for k, v in row.items():
                if isinstance(v, (float, np.floating)):
                    row[k] = round(float(v), digits)
        return rows


def _psd_correction(inst, h):
    """d-step predictive-SD correction (reference R/03_post_fit.R:353-365)."""
    if inst.kind == "IWP":
        p = inst.order
        return math.sqrt((h ** (2 * p - 1)) /
                         ((2 * p - 1) * math.factorial(p - 1) ** 2))
    if inst.kind == "sGP":
        return sum(compute_d_step_sgp_sd(h, j * inst.a)
                   for j in range(1, inst.m + 1))
    raise ValueError("PSD only defined for IWP and sGP terms")


def _kde(samples, n: int = 512, cut: float = 3.0):
    """Gaussian KDE matching R's density() defaults (bw.nrd0, 512 points,
    range extended by 3 bandwidths)."""
    x = np.asarray(samples, np.float64)
    n_s = len(x)
    sd = np.std(x, ddof=1)
    iqr = np.subtract(*np.percentile(x, [75, 25]))
    # R's bw.nrd0 uses IQR/1.34 (not the asymptotic 1.349)
    sigma = min(sd, iqr / 1.34) if iqr > 0 else sd
    bw = 0.9 * sigma * n_s ** (-0.2)
    grid = np.linspace(x.min() - cut * bw, x.max() + cut * bw, n)
    diff = (grid[:, None] - x[None, :]) / bw
    dens = np.exp(-0.5 * diff ** 2).sum(axis=1) / (n_s * bw * math.sqrt(2 * math.pi))
    return grid, dens
