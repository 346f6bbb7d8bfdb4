"""Adaptive Gauss-Hermite Quadrature over the hyperparameters theta.

TPU-native reimplementation of the `aghq` R package machinery the
reference delegates to (`aghq::marginal_laplace_tmb` at
R/02_model_fit.R:284, defaults k=4): optimize the Laplace marginal
nll(theta), adapt a product Gauss-Hermite grid with the mode and the
lower Cholesky of the inverse Hessian, and form the log normalizing
constant and theta marginals. On the fused paths the ENTIRE fit runs as
one or two device programs (build_fused_run_1d / build_fused_opt_nd +
build_fused_nodes), with node evaluations warm-chained under lax.scan
and optional in-program posterior draws — the reference runs the same
loop in R calling TMB per evaluation.

Conventions match aghq/mvQuad 'GHe': nodes are probabilists' Hermite
roots; weights integrate f against Lebesgue measure for f ~ poly x
exp(-z^2/2), i.e. w_i = hermegauss_w_i * exp(z_i^2 / 2); adapted nodes
theta_j = mode + L z_j with weight multiplier det(L).
"""
from __future__ import annotations

import itertools
import math
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .laplace import laplace_nll, laplace_nll_with_factor, laplace_mode_hess


def ghe_rule(k: int):
    """Probabilists' Gauss-Hermite: integrates g(z) ~ poly * e^{-z^2/2}.

    Returns (nodes, weights) with sum_i w_i g(z_i) ~= int g(z) dz.
    """
    z, w = np.polynomial.hermite_e.hermegauss(k)
    return z, w * np.exp(z ** 2 / 2.0)


def product_grid(k: int, s: int):
    """(k^s, s) node matrix and (k^s,) log-weights of the product rule."""
    z1, w1 = ghe_rule(k)
    nodes = np.array(list(itertools.product(z1, repeat=s)))
    logw = np.sum(np.log(w1)[
        np.array(list(itertools.product(range(k), repeat=s)))], axis=1)
    return nodes, logw



def _logsumexp_j(lw):
    """Traceable max-shifted logsumexp (in-program node weights)."""
    m = jnp.max(lw)
    return m + jnp.log(jnp.sum(jnp.exp(lw - m)))


def _logsumexp_np(lw):
    """Host max-shifted logsumexp (lognormconst / marginal grouping)."""
    lw = np.asarray(lw)
    m = lw.max()
    return float(m + np.log(np.sum(np.exp(lw - m))))


class JitCacheMixin:
    """Caches jitted closures so repeated fits on one backend reuse the
    compiled executables (fresh lambdas would miss jax's jit cache)."""

    def val_grad_fn(self):
        if not hasattr(self, "_vg"):
            self._vg = jax.jit(jax.value_and_grad(self.nll))
        return self._vg

    def hess_fn(self):
        if not hasattr(self, "_hess"):
            self._hess = jax.jit(jax.hessian(self.nll))
        return self._hess

    def vmap_nll_fn(self):
        if not hasattr(self, "_vnll"):
            self._vnll = jax.jit(jax.vmap(self.nll))
        return self._vnll

    def val_grad_warm_fn(self):
        if not hasattr(self, "_vgw"):
            self._vgw = jax.jit(
                jax.value_and_grad(self.nll_warm, has_aux=True))
        return self._vgw

    def hess_warm_fn(self):
        if not hasattr(self, "_hessw"):
            self._hessw = jax.jit(
                jax.hessian(lambda th, st: self.nll_warm(th, st)[0]))
        return self._hessw

    def vmap_nll_warm_fn(self):
        if not hasattr(self, "_vnllw"):
            self._vnllw = jax.jit(jax.vmap(
                lambda th, wm: self.nll_warm(th, wm)[0], in_axes=(0, None)))
        return self._vnllw


class DenseBackend(JitCacheMixin):
    """Default inference backend: dense designs, dense Cholesky.

    Exact for every model structure; the banded fast backend
    (bayesgp_tpu.fast) shares this interface for large single-IWP models.

    Supports the fused single-dispatch AGHQ programs (fused_fit_1d /
    build_fused_opt_nd + build_fused_nodes). On TPU this is not just the
    ~30 ms/dispatch tunnel saving measured for the fast backends: the
    host-loop path vmaps the dense Newton+Cholesky Laplace over the
    quadrature nodes (node_eval), which crashes the TPU worker (same
    fault class as vmapping the band factorization kernels, CLAUDE.md
    fact 4) — the fused node program lax.scans warm-chained evals
    instead, which compiles and runs fine on-chip.
    """

    supports_fused_1d = True
    supports_fused_nd = True

    def __init__(self, md):
        self.md = md

    @property
    def n_theta(self):
        return self.md.n_theta

    @property
    def dtype(self):
        return self.md.A.dtype

    @property
    def em_dims(self):
        """Per-theta penalized dimensions for the fused optimizers'
        EM-style jump (see fast/iwp.py em_dims): the prior contributes
        -0.5*d_r*theta_r per RE (d_r spline coefficients,
        src/BayesGP.cpp:227-232), and the Gaussian noise theta gets
        d = n from the likelihood. Custom families with extra
        hyperparameters have no generic EM structure -> None (the
        fused optimizers fall back to plain secant/BFGS steps)."""
        if self.md.family == -1 and self.md.custom_family:
            return None
        dims = [float(d) for d in self.md.d_sizes]
        if self.md.family == 0:
            dims.append(float(self.md.n))
        return np.asarray(dims) if dims else None

    def nll(self, theta):
        return laplace_nll(theta, self.md)[0]

    def init_state(self):
        return jnp.zeros((self.md.w_count,), self.dtype)

    def nll_warm(self, theta, warm):
        val, Ws = laplace_nll(theta, self.md, W0=warm)
        return val, jax.lax.stop_gradient(Ws)

    def laplace_eval_full(self, theta, warm):
        """(nll, latent mode, lower Hessian factor) in one pass — the
        per-node unit the fused programs chain (fast-backend interface).
        The factor is shared with the nll's half log-det (one Hessian
        build + factorization per node, laplace_nll_with_factor)."""
        val, Ws, Lw = laplace_nll_with_factor(theta, self.md, W0=warm)
        return (val, jax.lax.stop_gradient(Ws),
                jax.lax.stop_gradient(Lw))

    @staticmethod
    def node_pack(st, factor):
        """Per-node sampling state: (W*, L) — matches self.sample."""
        return (st, factor)

    def node_eval(self, thetas, warm=None):
        from ..model.objective import hessian_W

        def one(th, wm):
            nll, Ws = laplace_nll(th, self.md, W0=wm)
            Hw = hessian_W(Ws, th, self.md)
            Lw = jnp.linalg.cholesky(Hw)
            return nll, (Ws, Lw)

        if not hasattr(self, "_node_eval"):
            self._node_eval = jax.jit(jax.vmap(one, in_axes=(0, None)))
        if warm is None:
            warm = self.init_state()
        return self._node_eval(thetas, warm)

    def sample_traceable(self, key, states, idx, M):
        """(M, w) mixture draws — traceable (fused fit+sample)."""
        from jax.scipy.linalg import solve_triangular
        W_star, L = states
        w_dim = W_star.shape[1]
        z = jax.random.normal(key, (M, w_dim), dtype=W_star.dtype)

        def draw(i, zi):
            dev = solve_triangular(L[i], zi, lower=True, trans=1)
            return W_star[i] + dev

        return jax.vmap(draw)(idx, z)

    def sample(self, key, states, idx, M):
        if not hasattr(self, "_sample_jit"):
            self._sample_jit = jax.jit(
                self.sample_traceable, static_argnums=(3,))
        return np.asarray(self._sample_jit(key, states, idx, M)).T

    # ---- lifted fused programs (_lifted_jit protocol) ----
    # O(n) ModelData arrays enter the fused programs as ARGUMENTS, not
    # closure constants. Measured (round 15, CoxPH n=4000 fused s=1):
    # the embedded dense design was materialized as 26 separate ~2 MB
    # hex constants — 56 of 59.65 MB StableHLO — and the server-side
    # XLA compile through the tunnel ran past 20 minutes, twice.
    # cens/ranks (and the cc index fields) deliberately stay host
    # numpy: the scatter-free CoxPH rank regrouping
    # (model/families._coxph_static) needs them concrete at trace time.
    _LIFT_MD_DENSE = ("A", "y", "size")

    def device_args(self):
        out = {}
        for f in self._LIFT_MD_DENSE:
            v = getattr(self.md, f, None)
            if v is not None and np.ndim(v) >= 1 and np.size(v) > 1:
                out["md_" + f] = v
        return out

    def rebind(self, arrs):
        import dataclasses as _dcs
        md2 = _dcs.replace(self.md,
                           **{k[3:]: v for k, v in arrs.items()
                              if k.startswith("md_")})
        return type(self)(md2)

    def signature_fields(self):
        return (self.md,)


@dataclass
class AGHQFit:
    """Everything downstream code needs (mirrors aghq's fit object)."""
    mode: np.ndarray              # theta mode (s,)
    hessian: np.ndarray           # outer Hessian at mode (s, s)
    L: np.ndarray                 # lower chol of H^{-1} (adaptation)
    nodes: np.ndarray             # (J, s) adapted theta nodes
    logw: np.ndarray              # (J,) adapted log weights (incl. det L)
    lognll: np.ndarray            # (J,) laplace nll at nodes
    lognormconst: float
    states: Any                   # per-node latent modes/factors (backend)
    k: int
    backend: Any = None
    marginals: list = field(default_factory=list)  # per-dim (theta, logpdf)
    presampled: Any = None        # (samps (w, M), idx (M,), key) drawn
    #                               inside the fused fit program
    #                               (aghq_fit sample=(key, M))
    prepredicted: Any = None      # {"mean","plower","pupper"} predict
    #                               summaries computed inside the fused
    #                               fit program (aghq_fit predict=)

    @property
    def logpost_nodes(self):
        """Normalized log posterior at the nodes."""
        return -self.lognll - self.lognormconst


def _optimize_theta_1d(backend, theta0, tol, max_iter, verbose):
    """Secant-Newton on the GRADIENT root for a single hyperparameter.

    At f32 compute precision the nll VALUE carries ~3e-7|f| noise (a
    noise pit of ~0.05 at n=1e5 scales) which defeats f-based line
    searches near the mode, while the implicit-function gradient is far
    cleaner — so drive theta by the gradient's zero crossing: secant
    curvature h_k = (g_k - g_{k-1}) / (th_k - th_{k-1}), steps capped at
    2.0, a loose f-guard only against genuine divergence. Superlinear;
    typically 6-10 warm-started Laplace evaluations per fit.
    """
    dtype = backend.dtype
    val_grad = backend.val_grad_warm_fn()
    hess = backend.hess_warm_fn()
    state = backend.init_state()
    cdt = getattr(backend, "compute_dtype", backend.dtype)
    f_noise = 1e-9 if cdt in (np.float64, jnp.float64) else 3e-7

    th = float(np.asarray(theta0)[0])
    (f, state), g = val_grad(jnp.asarray([th], dtype), state)
    f, g = float(f), float(np.asarray(g)[0])
    th_prev, g_prev = None, None
    h_est = None
    cap, last_dir = 2.0, 0.0
    for it in range(max_iter):
        if abs(g) < tol:
            break
        # fine-scale gradient sign flip: the root is bracketed within the
        # gradient's fp noise resolution — one secant interpolation, then
        # stop (otherwise f32 paths churn ~20 evals wobbling in the
        # noise floor; measured on TPU)
        if (g_prev is not None and np.sign(g) != np.sign(g_prev)
                and abs(th - th_prev) < 0.05 * (1.0 + abs(th))):
            denom = g - g_prev
            if abs(denom) > 1e-300:
                th_root = th - g * (th - th_prev) / denom
                (f_r, state_r), g_r = val_grad(
                    jnp.asarray([th_root], dtype), state)
                f_r, g_r = float(f_r), float(np.asarray(g_r)[0])
                if np.isfinite(f_r):
                    th, f, g, state = th_root, f_r, g_r, state_r
            if verbose:
                print(f"  1d it={it} bracket stop th={th:.8f} g={g:.3e}")
            break
        if th_prev is not None and abs(th - th_prev) > 1e-12:
            h_new = (g - g_prev) / (th - th_prev)
            if np.isfinite(h_new) and h_new > 0:
                h_est = h_new
        h = h_est if (h_est is not None and h_est > 0) else max(abs(g), 1.0)
        step = np.clip(g / h, -cap, cap)
        # expanding cap: consecutive full-cap steps in one direction mean
        # the mode is far — double the trust radius (long cold marches)
        if abs(step) >= cap * 0.999:
            if np.sign(step) == last_dir:
                cap = min(cap * 2.0, 16.0)
            last_dir = float(np.sign(step))
        else:
            cap, last_dir = 2.0, 0.0
        if abs(step) < 1e-10 * (1.0 + abs(th)):
            break
        accepted = False
        for _ in range(8):
            cand = th - step
            (f_try, state_try), g_try = val_grad(
                jnp.asarray([cand], dtype), state)
            f_try, g_try = float(f_try), float(np.asarray(g_try)[0])
            # loose guard: reject only genuine blow-ups (f worse by much
            # more than fp noise), not noise-pit wobble
            if np.isfinite(f_try) and f_try <= f + max(
                    1e3 * f_noise * (1.0 + abs(f)), 1e-8):
                th_prev, g_prev = th, g
                th, f, g, state = cand, f_try, g_try, state_try
                accepted = True
                break
            step *= 0.25
        if not accepted:
            break
        if verbose:
            print(f"  1d it={it} th={th:.8f} f={f:.8f} g={g:.3e} h={h:.3e}")
        # converged when the Newton correction is tiny on the theta scale
        if h_est is not None and abs(g / max(h_est, 1e-12)) < 1e-4:
            break
    theta = jnp.asarray([th], dtype)
    H = hess(theta, state)
    return np.asarray(theta), np.asarray(H), float(f), state


class _Unsignable(Exception):
    pass


def _sig_update(h, x, skip_ids):
    """Deterministic content walk for backend_signature. Arrays in
    `skip_ids` (the lifted argument set) contribute shape/dtype only;
    every other array is hashed by VALUE — it is baked into the traced
    program as a constant, so two backends may share a compiled
    program only when all embedded constants match bit-for-bit."""
    import dataclasses as _dcs
    if x is None:
        h.update(b"\x00N")
    elif isinstance(x, (bool, int, float, complex, str, bytes,
                        np.integer, np.floating, np.bool_)):
        h.update(f"{type(x).__name__}:{x!r};".encode())
    elif isinstance(x, (np.dtype, type)):
        h.update(str(x).encode())
    elif isinstance(x, np.ndarray):
        if id(x) in skip_ids:
            # lifted argument: enters the program as a jit ARGUMENT, so
            # only its aval shapes the traced program — same-shape
            # backends share the compiled executable (fresh-process
            # lynx, dense CoxPH/cc refits)
            h.update(f"arg{x.shape}{x.dtype}".encode())
        else:
            h.update(f"nd{x.shape}{x.dtype}".encode())
            h.update(np.ascontiguousarray(x).tobytes())
    elif isinstance(x, jax.Array):
        if id(x) in skip_ids:
            h.update(f"arg{x.shape}{x.dtype}".encode())
        else:
            h.update(f"nd{x.shape}{x.dtype}".encode())
            h.update(np.ascontiguousarray(np.asarray(x)).tobytes())
    elif _dcs.is_dataclass(x) and not isinstance(x, type):
        h.update(type(x).__name__.encode())
        for f in _dcs.fields(x):
            h.update(f.name.encode())
            _sig_update(h, getattr(x, f.name), skip_ids)
    elif isinstance(x, (tuple, list)):
        h.update(f"seq{len(x)}".encode())
        for v in x:
            _sig_update(h, v, skip_ids)
    elif isinstance(x, dict):
        h.update(f"map{len(x)}".encode())
        for k in sorted(x, key=repr):
            h.update(repr(k).encode())
            _sig_update(h, x[k], skip_ids)
    elif hasattr(x, "tocsr") and hasattr(x, "nnz"):   # scipy sparse
        csr = x.tocsr()
        h.update(f"sp{csr.shape}{csr.dtype}".encode())
        h.update(np.ascontiguousarray(csr.indptr).tobytes())
        h.update(np.ascontiguousarray(csr.indices).tobytes())
        h.update(np.ascontiguousarray(csr.data).tobytes())
    else:
        fields = getattr(x, "signature_fields", None)
        if fields is not None:
            h.update(type(x).__name__.encode())
            _sig_update(h, fields(), skip_ids)
        else:
            raise _Unsignable(type(x).__name__)


def backend_signature(backend, arrs0):
    """Content fingerprint of everything a fused program embeds from
    `backend`: statics, shapes, and the VALUES of all non-lifted
    arrays. None when the backend holds objects we cannot fingerprint
    (custom closures, meshes) — those backends never share programs.
    Safe by construction: equal signatures => byte-identical traced
    programs up to the lifted arguments."""
    import hashlib
    skip_ids = {id(v) for v in jax.tree_util.tree_leaves(arrs0)}
    h = hashlib.sha256()
    try:
        _sig_update(h, backend, skip_ids)
        h.update(f"dev:{jax.default_backend()}".encode())
    except _Unsignable:
        return None
    return h.hexdigest()


# compiled lifted programs shared ACROSS backend instances:
# (backend_signature, prog_key) -> jitted program. This is what makes a
# fresh `model_fit` of a same-shaped small model cheap: the reference
# pays a seconds-scale TMB tape build per model (R/02_model_fit.R:276),
# while a per-call jax trace+lower+load through the tunnel costs ~36 s
# at lynx scale (BENCH_NOTES round 13) — with this cache a refit reuses
# the compiled executable outright.
_LIFTED_PROGS: dict = {}


def _lifted_jit(backend, builder, prog_key=None):
    """jit the traceable program `builder(backend)`, lifting the
    backend's O(n) arrays from the closure to ARGUMENTS (fast backends
    only; see fast/iwp.backend_device_args). jit materializes
    closure-captured arrays as constants embedded in the program —
    bloating the serialized module ~15x at headline scale (slower cold
    compile / cache IO) and pinning them replicated, which would defeat
    observation-axis sharding (parallel/data_sharded.py): GSPMD can
    only partition arrays that enter through the argument pytree.
    `builder` must return the raw traceable function (jit=False).

    prog_key (hashable, fully describing the builder configuration)
    opts into the process-level _LIFTED_PROGS cache: a backend with an
    equal content signature reuses the already-jitted program — no
    retrace, no relower, no executable reload."""
    from ..fast.iwp import (backend_device_args, backend_rebind,
                            backend_host_constants)

    is_fast = hasattr(backend, "valsT")
    if is_fast:
        arrs0 = backend_device_args(backend)
    elif hasattr(backend, "device_args"):
        # lifted-protocol backends (DenseBackend, ScatterIIDBackend):
        # same contract as the fast path via methods
        arrs0 = backend.device_args()
    else:
        arrs0 = None
    if not arrs0:
        return jax.jit(builder(backend))

    sig = (backend_signature(backend, arrs0)
           if prog_key is not None else None)
    if sig is not None:
        prog = _LIFTED_PROGS.get((sig, prog_key))
        if prog is not None:
            arrs_d = jax.tree_util.tree_map(jnp.asarray, arrs0)
            return lambda *a: prog(arrs_d, *a)

    # non-lifted arrays become embedded constants: pull them to host
    # FIRST or MLIR lowering pays one tunnel round trip per constant
    # (measured 569 s -> seconds at headline scale; see
    # fast/iwp.backend_host_constants). Lifted arrays are skipped —
    # they enter as arguments, never as constants.
    backend = backend_host_constants(
        backend, skip=jax.tree_util.tree_leaves(arrs0))

    # put numpy leaves (md.y, ...) on device ONCE: numpy jit arguments
    # re-upload on every call (~30 ms/dispatch tunnel + transfer);
    # jnp.asarray leaves placement uncommitted, so sharded programs
    # still accept them as replicated operands
    arrs0 = jax.tree_util.tree_map(jnp.asarray, arrs0)

    def _run(arrs, *a):
        be = (backend_rebind(backend, arrs) if is_fast
              else backend.rebind(arrs))
        return builder(be)(*a)

    jfn = jax.jit(_run)
    if sig is None:
        return lambda *a: jfn(arrs0, *a)

    # two-level caching: the process-level _LIFTED_PROGS entry is a
    # callable resolved lazily at FIRST CALL against the on-disk
    # executable cache (utils/prog_cache) — a fresh process with an
    # identical model deserializes the compiled executable outright
    # instead of paying trace+lower+load (~36 s at lynx scale through
    # the tunnel, BENCH_NOTES round 13; the reference's R session fits
    # the same model in seconds every time).
    from ..utils import prog_cache as _pc
    state = {"exe": None, "kind": None}

    def prog(arrs, *a):
        if state["exe"] is None:
            state["exe"], state["kind"] = _pc.get_or_compile(
                jfn, sig, prog_key, (arrs,) + a)
        if state["kind"] != "jit":
            # executables check avals strictly; any mismatch
            # (weak-type drift, stale disk entry, a re-call with
            # different arg types) falls back to the ordinary jit
            # path for good — jit retraces where an exe raises
            try:
                return state["exe"](arrs, *a)
            except (TypeError, ValueError, jax.errors.JaxRuntimeError):
                state["exe"], state["kind"] = jfn, "jit"
        return state["exe"](arrs, *a)

    _LIFTED_PROGS[(sig, prog_key)] = prog
    return lambda *a: prog(arrs0, *a)


def fused_fit_1d(backend, k: int = 4, theta0: float = 0.0,
                 tol: float = 1e-9, max_iter: int = 40, sample=None,
                 packed_opt: bool = None, predict=None):
    """The ENTIRE s=1 AGHQ fit as ONE jitted device program: secant-
    Newton on the gradient root (same scheme as _optimize_theta_1d),
    FD Hessian at the mode, GH adaptation, and the k node evaluations —
    a single dispatch instead of ~35. With sample=(key, M), the M
    posterior mixture draws run INSIDE the same program (same key
    discipline and logits arithmetic as sampling.sample_marginal) and
    two extra outputs (idx (M,), samps (w, M)) are appended — fit +
    posterior samples in one dispatch for the dispatch-bound
    small-model regime.

    Motivation (measured): after the Pallas engine + MXU design work, a
    full warm Laplace evaluation is ~10 ms of device time while every
    host->device round trip through the tunnel costs ~30 ms — the fit
    had become pure dispatch overhead. (The reference runs this loop in
    R calling TMB per evaluation, R/02_model_fit.R:284.)

    Differences from the host loop: rejected steps shrink the trust cap
    for the next iteration instead of retrying within the iteration
    (one vg evaluation per loop step — rejections are rare and cost one
    extra cheap iteration), and the bracket-stop's secant evaluation
    runs as a flagged final iteration.

    Returns (mode (1,), H (1,1), nodes (k,1), nlls (k,), states) as
    device arrays; weights/marginals are host arithmetic downstream.
    """
    cache = getattr(backend, "_fused_fit_progs", None)
    if cache is None:
        cache = backend._fused_fit_progs = {}
    sample_M = 0 if sample is None else int(sample[1])
    pspec = xs_pred = None
    if predict is not None:
        pspec, xs_pred = predict
        if not sample_M:
            raise ValueError("predict= needs sample=(key, M)")
    pkey = (None if pspec is None else
            (len(xs_pred), pspec.get("degree", 0),
             pspec.get("level", 0.95), pspec.get("rows", 1024),
             pspec.get("include_intercept", True),
             int(pspec.get("p", 0)),
             np.ascontiguousarray(
                 np.asarray(pspec.get("knots", ()))).tobytes()))
    ckey = (k, tol, max_iter, sample_M, packed_opt, pkey)
    if ckey not in cache:
        cache[ckey] = _lifted_jit(
            backend, lambda be: build_fused_run_1d(
                be, k, tol, max_iter, jit=False, sample_M=sample_M,
                packed_opt=packed_opt, predict_spec=pspec),
            prog_key=("fit1d",) + ckey)

    th0 = jnp.asarray(float(np.atleast_1d(theta0)[0]), backend.dtype)
    # ONE host transfer for all small outputs (each np.asarray on a
    # device array is its own round trip through the tunnel)
    if pspec is not None:
        rows = int(pspec.get("rows", 1024))
        n_pred = len(xs_pred)
        nb = -(-n_pred // rows)
        xs_pad = np.full(nb * rows, xs_pred[-1], np.float32)
        xs_pad[:n_pred] = xs_pred
        out = cache[ckey](th0, backend.init_state(), sample[0],
                          jnp.asarray(xs_pad.reshape(nb, rows)))
        mode, H, nodes, nlls, states, idx, samps, pm, plo, phi = out
        (mode, H, nodes, nlls, idx, samps, pm, plo, phi) = \
            jax.device_get((mode, H, nodes, nlls, idx, samps, pm,
                            plo, phi))
        extra = (idx, np.asarray(samps, np.float64).T,
                 {"mean": np.asarray(pm, np.float64).ravel()[:n_pred],
                  "plower": np.asarray(plo, np.float64).ravel()[:n_pred],
                  "pupper": np.asarray(phi, np.float64).ravel()[:n_pred]})
    elif sample_M:
        mode, H, nodes, nlls, states, idx, samps = cache[ckey](
            th0, backend.init_state(), sample[0])
        mode, H, nodes, nlls, idx, samps = jax.device_get(
            (mode, H, nodes, nlls, idx, samps))
        extra = (idx, np.asarray(samps, np.float64).T)
    else:
        mode, H, nodes, nlls, states = cache[ckey](
            th0, backend.init_state())
        mode, H, nodes, nlls = jax.device_get((mode, H, nodes, nlls))
        extra = ()
    return (np.asarray(mode).reshape(1), np.asarray(H).reshape(1, 1),
            np.asarray(nodes).reshape(k, 1), np.asarray(nlls),
            states) + extra


def _packed_lane_view(backend, R):
    """Lane-packed BatchedFastIWP view of `backend` with the SAME
    response in every slot — the engine of build_fused_run_1d's packed
    FD/node phase (R = max(k, 2) slots share every O(n) design pass and
    every band factorization as one batched MXU/Pallas program, instead
    of 2+k sequential warm Laplace evaluations; device trace round 10:
    the sequential FD scan + two node-side scans were 116 ms of the
    337 ms steady fit). Returns None when the backend is not
    lane-packable. Traceable (md.y may be a lifted-argument tracer);
    the batched view's ll constant is set to ZERO on purpose: the FD
    phase consumes only theta-gradients (constants drop), and the node
    values are computed with families.log_lik directly so they carry
    the exact constant the optimizer's scalar path uses.

    Data-sharded backends (parallel/data_sharded.py) pack too: the
    batched view consumes the SAME chunk arrays (ck.D / XFp_rows) that
    carry the NamedShardings, so GSPMD partitions the replicate-batched
    einsums over the chunk axis exactly like the scalar ones — the R
    lane slots stay replicated, the O(n.w) design work shards."""
    from ..fast.iwp import FastIWPBackend
    from ..fast import batched as fb
    if not isinstance(backend, FastIWPBackend):
        return None
    if backend.chunks is None or backend.n_theta != 1:
        return None
    if int(backend.md.family) not in (1, 2):
        return None
    if R > fb.max_replicates(backend.p):
        return None
    try:
        eng = fb.make_engine_batched(backend, R)
    except Exception:
        return None
    y = jnp.asarray(backend.md.y, backend.compute_dtype)
    Y = jnp.broadcast_to(y[None], (R,) + y.shape)
    llc = jnp.zeros((R,), backend.dtype)
    return fb.make_batched(backend, Y, llc, R, eng)


def _packed_node_phase(backend, pk, nodes, stR, k, return_states):
    """All k node evaluations as ONE lane-packed batched Laplace pass.

    pk: the _packed_lane_view (R = max(k, 2) slots); stR: the mode
    state broadcast to R slots; every node warm-starts from the mode.
    The lane-packed engine carries the inner Newton solve and the band
    assembly for all nodes together; the per-node Hessian factors are
    then re-factored through the SCALAR engine (k small ~1 ms kernels)
    so that (a) the half log-dets enter the node values exactly as on
    the scalar path and (b) the sampling states keep the scalar
    engine's factor format (fast/iwp.sample_traceable). Node values
    use model/families.log_lik directly — same likelihood constant as
    the optimizer's scalar evaluations (pk's ll_const is zero).

    Returns (nlls,) or (nlls, states) matching the sequential scans'
    stacked layout: states = (V (k, dpad), tail (k, q), (af, sc, sd)).
    """
    from ..model import families
    R = pk.R
    dtype = backend.dtype
    cdt = backend.compute_dtype
    thN = (jnp.concatenate([nodes, jnp.broadcast_to(nodes[-1],
                                                    (R - k,))])
           if R > k else nodes)
    Vb, tb = pk.solve_W_star(thN, warm=stR)
    eN = pk.eta(Vb, tb)
    band_s, C_s, Hd_b, scb, sdb = pk._assemble_scaled(Vb, tb, thN,
                                                      eta=eN)
    lls = jax.vmap(
        lambda e_, t_: families.log_lik(
            e_, backend.md, jnp.reshape(t_, (1,)).astype(cdt)))(eN, thN)
    f_b = -lls.astype(dtype) + pk._prior_neg(Vb, tb, thN)
    afs = [backend.engine.factor(band_s[j], C_s[j], Hd_b[j])
           for j in range(k)]
    hlds = jnp.stack([backend.engine.half_logdet(afs[j])
                      for j in range(k)])
    half_logdets = (hlds - jnp.sum(jnp.log(scb[:k]), axis=1)
                    - jnp.sum(jnp.log(sdb[:k]), axis=1))
    w_count = backend.d + backend.q
    nlls = (f_b[:k] + half_logdets
            - 0.5 * w_count * math.log(2.0 * math.pi) - backend.logdetT)
    if not return_states:
        return (nlls,)
    af_stack = jax.tree_util.tree_map(lambda *x: jnp.stack(x), *afs)
    factor = (af_stack, scb[:k], sdb[:k])
    pack = getattr(backend, "node_pack",
                   lambda st_, f_: (st_[0], st_[1], f_))
    # st_/factor here are already stacked over the k nodes (the scan
    # path packs per node then stacks; same leaves either way)
    states = pack((Vb[:k], tb[:k]), factor)
    return (nlls, states)


_LADDER_R = 8   # preferred slot count for the packed theta ladder


def _ladder_offsets(R: int):
    """Static slot layouts of the packed theta ladder (host constants).

    init: pass-0 offsets from theta0 — one probe below, theta0 itself,
    and a geometric march upward (log-precision modes are usually
    positive and can sit ~15 units from the cold start at scale; a
    negative mode leaves all pass-0 gradients positive and the EM far
    phase marches downward instead). The top probe is 15, not further:
    measured on-chip at headline scale, a theta=20 slot's inner Newton
    stalls at its f32 noise floor (rel step 7.5e-5 > steptol) and costs
    the stall-cutoff window of extra batched steps every cold pass.
    far:  multiples of the EM-or-descent jump (see em_dims and the
    body). The top multiple is deliberately LOCAL (2.8): teleporting
    ladders reached numerically-degraded theta regions whose garbage
    finite f then poisoned the best-by-f tracking (measured: an IWP3
    Poisson model with a strong smooth signal has spurious gradient
    sign changes and NaN f beyond theta ~ 30).
    fine: bracket-relative offsets for slots 3..R-1 (slots 0-2 are the
    secant root and the root +/- h_fd FD pair), alternating signs so the
    innermost pair tightens the bracket superlinearly."""
    pos = np.geomspace(1.8, 15.0, R - 2)
    init = np.concatenate([[-2.5], [0.0], pos])
    far = np.geomspace(0.55, 2.8, R)
    base = [0.07, 0.24, 0.45, 0.7, 1.0, 1.35, 1.75]
    fine = [base[min(i // 2, len(base) - 1)] * (1 if i % 2 == 0 else -1)
            for i in range(R - 3)]
    return init, far, np.asarray(fine, np.float64)


def _build_ladder_opt(backend, pk, tol, max_iter, h_fd, em_dim, em_phi,
                      th_tol):
    """Lane-packed theta LADDER: the s=1 outer optimization as a few
    batched Laplace passes instead of the scalar secant march.

    Every while-loop iteration evaluates R candidate thetas in ONE
    lane-packed batched pass (same engine as the packed FD/node phase,
    _packed_lane_view) and uses the R gradients to bracket the gradient
    root:

      pass 0   static spread around theta0 (usually brackets the mode
               outright — covid-scale modes sit ~15 units out);
      far      no bracket yet: EM fixed-point jumps from the best point,
               laddered over under/over-shoot multiples;
      fine     bracketed: slots at the secant root, the root +/- h_fd FD
               pair (the outer Hessian comes FREE from these two — no
               separate FD pass), and bracket-relative offsets; the
               innermost sign change tightens the bracket superlinearly.

    Converges when the root slot's Newton correction |g(root)|/H drops
    below th_tol (the scalar march's criterion) with the FD Hessian in
    hand. Device trace round 10: the scalar march was 181 ms of the
    337 ms headline fit (8 sequential warm evaluations) + 35 ms cold
    eval + 31 ms packed FD; the ladder replaces all three with 4
    batched passes — but MEASURED SLOWER on-chip (~100 ms/pass; see
    the packed_opt docstring in build_fused_run_1d), so it is opt-in.
    Returns (mode, H, st) with st the best slot's latent state (the
    warm start for the packed node phase)."""
    R = pk.R
    dtype = backend.dtype
    init_o, far_o, fine_o = _ladder_offsets(R)
    init_j = jnp.asarray(init_o, dtype)
    far_j = jnp.asarray(far_o, dtype)
    fine_j = jnp.asarray(fine_o, dtype)
    em_c = jnp.asarray(math.log(em_dim), dtype)

    def _sum_nll(th, state):
        f, st = pk.nll_warm(th, state)
        return jnp.sum(f), (f, st)

    # a slot only counts if its inner Newton actually CONVERGED: at
    # extreme theta the solver can break down and return chaotic
    # garbage with FINITE (sometimes low!) f that would poison the
    # best-by-f tracking and lock the bracket inside the breakdown
    # zone (measured: an IWP3 Poisson model returns f varying by
    # hundreds between thetas 1e-7 apart beyond theta ~ 30, residuals
    # 1e1 vs 1e-8 converged). One extra batched factorization+solve
    # per pass measures the post-convergence Newton step; the
    # threshold is a loose multiple of the solver's own steptol
    # (fast/batched.newton_solve).
    _cdt = getattr(backend, "compute_dtype", backend.dtype)
    steptol = 1e-9 if _cdt in (np.float64, jnp.float64) else 3e-6
    step_thresh = 1e3 * steptol

    def _conv_check(op):
        thc, V, tail = op
        gV, gt = pk.grad_W(V, tail, thc)
        factor = pk.hessian_factor(V, tail, thc)
        sV, stl = pk.solve_H(factor, gV, gt)
        snorm = jnp.max(jnp.abs(sV), axis=1)
        if pk.q:
            snorm = jnp.maximum(snorm, jnp.max(jnp.abs(stl), axis=1))
        rel = snorm / (1.0 + jnp.max(jnp.abs(V), axis=1))
        return jnp.isfinite(rel) & (rel < step_thresh)

    def vgR(th, st1, skip_check):
        # ONE batched Laplace pass: all R slots warm-start from the
        # best point's state; the sum's gradient is the per-slot
        # gradient vector (independent slots). The convergence check
        # only runs for UNBRACKETED passes (skip_check=False): fine
        # slots live inside a bracket whose endpoints were already
        # validated converged, so the extra factorization is skipped
        stR = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (R,) + x.shape), st1)
        (_, (f, st)), g = jax.value_and_grad(
            _sum_nll, has_aux=True)(th, stR)
        V, tail = jax.lax.stop_gradient(st)
        thc = jax.lax.stop_gradient(th)
        conv = jax.lax.cond(skip_check,
                            lambda op: jnp.ones((R,), bool),
                            _conv_check, (thc, V, tail))
        return f, g, st, conv

    def secant_root(lo, g_lo, hi, g_hi):
        w = hi - lo
        denom = g_hi - g_lo
        r = jnp.where(jnp.abs(denom) > 1e-300,
                      lo - g_lo * w / denom, 0.5 * (lo + hi))
        return jnp.clip(r, lo, hi)

    def cond(c):
        return jnp.logical_and(~c["done"], c["it"] < max_iter)

    def body(c):
        w = c["hi"] - c["lo"]
        root = secant_root(c["lo"], c["g_lo"], c["hi"], c["g_hi"])
        eps_w = 1e-3 * w
        # Newton-polish slot once the FD Hessian is in hand: quadratic
        # tightening from the best point (the pure secant root needs
        # one more pass for the same landing error). Falls back to the
        # first bracket-relative offset before the first FD pass.
        Hn = jnp.maximum(jnp.abs(c["H"]), 1e-12)
        newt = jnp.where(c["seen_fd"], c["th"] - c["g"] / Hn,
                         root + w * fine_j[0])
        fine = jnp.concatenate([
            jnp.stack([root, root - h_fd, root + h_fd]),
            jnp.clip(jnp.concatenate([newt[None], root + w * fine_j[1:]]),
                     c["lo"] + eps_w, c["hi"] - eps_w)])
        # EM far jump from the best (lowest-f) point (exp-hyperprior
        # slope hp'(th) = 1/2 - phi/2 e^{-th/2}; build_fused_run_1d).
        # On the large-theta plateau the envelope term vanishes and
        # em -> 0 with a noise-dominated sign — fall back to the
        # descent direction -sign(g); `mscale` shrinks the march when
        # a pass fails to improve f (the scalar march's trust cap)
        hp = 0.5 - 0.5 * em_phi * jnp.exp(-0.5 * c["th"])
        A = 2.0 * (c["g"] - hp) + em_dim
        em = jnp.clip(em_c - jnp.log(jnp.maximum(A, 1e-4 * em_dim)),
                      -8.0, 8.0)
        # the EM fixed point exists only for A > 0 (g above the
        # envelope's -d/2 floor); outside that, and on the plateau
        # where em -> 0 with a noise sign, march locally along the
        # descent direction with unit magnitude instead
        em_ok = (A > 1e-3 * em_dim) & (jnp.abs(em) >= 0.5)
        jdir = jnp.where(em_ok, jnp.sign(em), -jnp.sign(c["g"]))
        jmag = jnp.where(em_ok, jnp.abs(em), 1.0) * c["mscale"]
        far = c["th"] + jdir * jmag * far_j
        cands = jnp.where(c["it"] == 0, c["th"] + init_j,
                          jnp.where(c["have"], fine, far))
        f, g, sts, conv = vgR(cands, c["st"],
                              c["have"] & (c["it"] > 0))
        valid = jnp.isfinite(f) & jnp.isfinite(g) & conv
        # best point = lowest f (NOT smallest |g|: numerically-degraded
        # large-theta regions show |g| minima and spurious sign changes
        # far from the mode at catastrophically worse f — measured on
        # an IWP3 Poisson model whose plateau g ~ hp' ~ 0.5 undercut
        # the near-mode gradients)
        fv = jnp.where(valid, f, jnp.inf)
        ib = jnp.argmin(fv)
        better = valid[ib] & (fv[ib] < c["fb"])
        th2 = jnp.where(better, cands[ib], c["th"])
        g2 = jnp.where(better, g[ib], c["g"])
        fb2 = jnp.where(better, f[ib], c["fb"])
        st2 = jax.tree_util.tree_map(
            lambda n, o: jnp.where(better, n[ib], o), sts, c["st"])
        # bracket update ANCHORED at the best point: the tightest
        # (negative-g at/below, nonnegative-g at/above) pair around it
        # (a global max-neg/min-pos rule deadlocks on the spurious
        # large-theta sign changes); lo <= th2 <= hi by construction
        TH = jnp.concatenate([cands, jnp.stack([c["lo"], c["hi"]])])
        GG = jnp.concatenate([g, jnp.stack([c["g_lo"], c["g_hi"]])])
        VV = jnp.concatenate([valid, jnp.stack([c["have"], c["have"]])])
        negm = VV & (GG < 0) & (TH <= th2)
        posm = VV & (GG >= 0) & (TH >= th2)
        i_lo = jnp.argmax(jnp.where(negm, TH, -jnp.inf))
        i_hi = jnp.argmin(jnp.where(posm, TH, jnp.inf))
        have2 = jnp.any(negm) & jnp.any(posm)
        lo2 = jnp.where(have2, TH[i_lo], c["lo"])
        g_lo2 = jnp.where(have2, GG[i_lo], c["g_lo"])
        hi2 = jnp.where(have2, TH[i_hi], c["hi"])
        g_hi2 = jnp.where(have2, GG[i_hi], c["g_hi"])
        mscale2 = jnp.where(have2 | better, jnp.asarray(1.0, dtype),
                            jnp.maximum(c["mscale"] * 0.4, 1e-3))
        used_fine = c["have"] & (c["it"] > 0)
        fd_ok = used_fine & valid[1] & valid[2]
        H2 = jnp.where(fd_ok, (g[2] - g[1]) / (2.0 * h_fd), c["H"])
        seen2 = c["seen_fd"] | fd_ok
        root2 = secant_root(lo2, g_lo2, hi2, g_hi2)
        Hc = jnp.maximum(jnp.abs(H2), 1e-12)
        # converged when the root slot OR the Newton-polish slot shows a
        # sub-th_tol correction (the returned mode is the final
        # bracket's secant root, which both slots have just tightened)
        done = (used_fine & seen2
                & ((valid[0] & (jnp.abs(g[0]) / Hc < th_tol))
                   | (valid[3] & (jnp.abs(g[3]) / Hc < th_tol))))
        done = done | (seen2 & (jnp.abs(g2) < tol))
        # ... or when the BRACKET is tight: the returned mode (the
        # bracket's secant root) is within w of the gradient's sign
        # change, the same error class as the |g|/H criteria. This is
        # the criterion that actually fires at f32 production scale,
        # where the theta-gradient noise is O(1) (measured +/-3 at
        # n=1e5/d=2009 within a 3e-4 bracket) and |g|/H can NEVER reach
        # th_tol — without it the loop burned all max_iter passes
        # (traced on-chip: bracket 3e-4 wide by pass 3, then 36 stuck
        # 60 ms passes).
        w2 = hi2 - lo2
        done = done | (have2 & seen2
                       & (w2 < th_tol * (1.0 + jnp.abs(root2))))
        # ... or on stall: no new best point and no bracket tightening
        # for 3 consecutive fine passes means every slot is inside the
        # noise floor — accept the root rather than re-rolling the dice
        tighter = have2 & (w2 < 0.98 * (c["hi"] - c["lo"]))
        stall2 = jnp.where(better | tighter | ~have2, 0,
                           c["stall"] + 1)
        done = done | (have2 & seen2 & (stall2 >= 3))
        return {"th": th2, "g": g2, "fb": fb2, "st": st2,
                "lo": lo2, "hi": hi2,
                "g_lo": g_lo2, "g_hi": g_hi2, "have": have2,
                "mscale": mscale2, "stall": stall2,
                "H": H2, "seen_fd": seen2, "root": root2,
                "done": done, "it": c["it"] + 1}

    def init_carry(th0, state0):
        zs = jnp.asarray(0.0, dtype)
        return {"th": th0 + zs, "g": jnp.asarray(1e30, dtype),
                "fb": jnp.asarray(jnp.inf, dtype),
                "st": state0, "lo": th0 + zs, "hi": th0 + zs,
                "g_lo": zs, "g_hi": zs, "have": jnp.asarray(False),
                "mscale": jnp.asarray(1.0, dtype),
                "stall": jnp.asarray(0),
                "H": zs, "seen_fd": jnp.asarray(False), "root": th0 + zs,
                "done": jnp.asarray(False), "it": jnp.asarray(0)}

    def run(th0, state0):
        c = jax.lax.while_loop(cond, body, init_carry(th0, state0))
        mode = jnp.where(c["have"], c["root"], c["th"])
        # H fallback when max_iter ran out before an FD pass: the
        # bracket's secant slope (only places quadrature nodes)
        w = c["hi"] - c["lo"]
        h_sec = jnp.where(c["have"] & (w > 1e-12),
                          (c["g_hi"] - c["g_lo"]) / jnp.maximum(w, 1e-12),
                          jnp.maximum(jnp.abs(c["g"]), 1.0))
        H = jnp.where(c["seen_fd"], c["H"], h_sec)
        return mode, H, c["st"]

    # debugging hooks: run the loop eagerly pass-by-pass (tools/)
    run.cond, run.body, run.init_carry = cond, body, init_carry
    return run


def _node_eval_packed(backend, th, warm, return_states):
    """One warm-started Laplace node evaluation inside a fused program.

    Uses the backend's `laplace_eval_full` (nll + latent state + Hessian
    factor in ONE assembly/factorization, shared with the value's half
    log-det) when available, else nll_warm + a separate hessian_factor.
    Returns (nll, packed_sampling_state_or_None, raw_state); the packed
    form is what `backend.sample` consumes (node_pack hook)."""
    pack = getattr(backend, "node_pack",
                   lambda st_, f_: (st_[0], st_[1], f_))
    if return_states and hasattr(backend, "laplace_eval_full"):
        nll, st, factor = backend.laplace_eval_full(th, warm)
        return nll, pack(st, factor), st
    nll, st = backend.nll_warm(th, warm)
    if not return_states:
        return nll, None, st
    factor = backend.hessian_factor(st[0], st[1], th)
    return nll, pack(st, factor), st


def build_fused_run_1d(backend, k: int, tol: float = 1e-9,
                       max_iter: int = 40, jit: bool = True,
                       return_states: bool = True, sample_M: int = 0,
                       packed_nodes: bool = None,
                       packed_opt: bool = None,
                       predict_spec: dict = None):
    """Construct (without executing) the jitted fused-fit program of
    fused_fit_1d. jit=False returns the raw traceable function (for
    embedding in larger programs, e.g. sharded replicate fits);
    return_states=False drops the per-node latent/factor states (saves
    memory when only mode/nlls are needed); sample_M > 0 appends the
    in-program posterior mixture draws (run takes an extra PRNG key,
    returns extra idx/samps outputs — see fused_fit_1d).

    packed_nodes: None (auto: ON when the backend is lane-packable, see
    _packed_lane_view) | False (always the sequential scans — REQUIRED
    when the program itself is mapped over, e.g. replicate fits under
    lax.map: nesting the batched Pallas kernels under an outer map is
    untested on-chip) | True (error if ineligible). When ON, the FD
    Hessian pair and the k node evaluations each run as ONE lane-packed
    batched Laplace evaluation instead of 2+k sequential warm ones; the
    node warm start is the mode state for every node (the sequential
    scans chain adjacent nodes), so converged node states agree with
    the scan path only to the inner-Newton tolerance.

    packed_opt: None/False (default: the scalar secant march + packed
    FD/nodes — the mode matches the sequential program bit-for-bit) |
    True (error if ineligible). When True, the outer optimization runs
    as the lane-packed theta LADDER (_build_ladder_opt): 4 batched
    passes replace the cold eval + the ~8-iteration scalar march + the
    separate FD pass, landing on the same |correction| < th_tol
    criterion — the mode agrees with the scalar march's to optimizer
    tolerance (~1e-7 f64 / ~1e-4 f32), not bit-for-bit.

    The ladder is OPT-IN, not the default, on an on-chip MEASUREMENT
    (headline n=1e5/d=2009, v5 lite, round 11): it converges in 4
    batched passes but each costs ~100 ms — the batched inner Newton
    runs max-over-slots iterations, and slots far from the incumbent
    (pass-0 cold spread, early wide-bracket fine slots) stall at their
    f32 noise floor for the full stall window — so the optimizer phase
    measured 410 ms vs the march's 247 ms (steady fit 0.513 s vs
    0.350 s) and costs ~560 s extra cold compile. The packed FD/node
    phases (slots at mode +/- h, warm from the MODE state, uniform
    ~5-iteration convergence) are where lane packing pays; keep them
    on. packed_nodes=False disables the ladder too (both ride the same
    batched engine).

    MAINTENANCE: build_fused_run_1d_batched is the hand-vectorized (R,)
    twin of this SCALAR optimizer body — mirror any logic change there
    (the packed FD/node/ladder phases intentionally do NOT apply there:
    R replicates x k slots would exceed the lane capacity)."""
    if sample_M and not return_states:
        raise ValueError("sample_M requires return_states")
    if predict_spec is not None and not sample_M:
        raise ValueError("predict_spec requires sample_M > 0 (the "
                         "in-program draws feed the predict summaries)")
    dtype = backend.dtype
    cdt = getattr(backend, "compute_dtype", dtype)
    f_noise = 1e-9 if cdt in (np.float64, jnp.float64) else 3e-7
    h_fd = 1e-4 if cdt in (np.float64, jnp.float64) else 0.3
    th_tol = 1e-7 if cdt in (np.float64, jnp.float64) else 1e-4
    _dims0 = getattr(backend, "em_dims", None)
    _em0 = None if _dims0 is None else float(np.asarray(_dims0)[0])
    want_opt = (packed_nodes is not False and packed_opt is True
                and _em0 is not None)
    pk = None
    if packed_nodes is not False:
        if want_opt:
            pk = _packed_lane_view(backend, max(k, 2, _LADDER_R))
        if pk is None:
            pk = _packed_lane_view(backend, max(k, 2))
    ladder = want_opt and pk is not None and pk.R >= 4
    if packed_nodes is True and pk is None:
        raise ValueError("packed_nodes=True but the backend is not "
                         "lane-packable (see _packed_lane_view)")
    if packed_opt is True and not ladder:
        raise ValueError("packed_opt=True but the ladder is not "
                         "eligible (needs a lane-packable backend with "
                         "EM structure and >= 4 slots)")
    z1, _ = ghe_rule(k)
    # EM-style jump constants (see em_dims docstring): by the envelope
    # theorem dF/dth = 0.5[e^th(Q + tr(H^-1 P)) - d] + hp'(th), so one
    # gradient gives the fixed-point root th + log(d / (2(g-hp') + d)).
    # From a cold start this replaces the blind expanding-cap march
    # (the mode sits ~14 units from th0=0 at headline scale) with 2-4
    # self-correcting jumps; the secant polish takes over near the mode.
    em_dim = _em0
    if em_dim is not None:
        _alpha = float(np.asarray(backend.md.alpha).reshape(-1)[0])
        _u = float(np.asarray(backend.md.u).reshape(-1)[0])
        em_phi = -math.log(_alpha) / _u

    ladder_run = (_build_ladder_opt(backend, pk, tol, max_iter, h_fd,
                                    em_dim, em_phi, th_tol)
                  if ladder else None)

    def vg(th_scalar, state):
        (f, st), g = jax.value_and_grad(
            backend.nll_warm, has_aux=True)(
                jnp.reshape(th_scalar, (1,)).astype(dtype), state)
        return f, g[0], st

    def _optimize_and_hess(th0, state0):
        """(mode, H, warm latent state at the mode) — the lane-packed
        ladder when eligible, else the scalar secant march + FD pair."""
        if ladder:
            return ladder_run(th0, state0)

        def cond(c):
            return jnp.logical_and(~c["done"], c["it"] < max_iter)

        def body(c):
            # iteration 0 is the BOOT evaluation: step forced to 0 so
            # the body's vg call lands exactly on th0 — the cold eval
            # folded INTO the loop, so the warm Laplace body is traced
            # ONCE here instead of once more outside (compile time; the
            # evaluation sequence, and with it the mode, is unchanged)
            boot = c["it"] == 0
            have_h = c["h_est"] > 0
            h = jnp.where(have_h, c["h_est"],
                          jnp.maximum(jnp.abs(c["g"]), 1.0))
            step = jnp.clip(c["g"] / h, -c["cap"], c["cap"])
            use_em = jnp.asarray(False)
            if em_dim is not None:
                # exp-hyperprior slope: hp'(th) = 1/2 - phi/2 e^{-th/2}
                hp = 0.5 - 0.5 * em_phi * jnp.exp(-0.5 * c["th"])
                A = 2.0 * (c["g"] - hp) + em_dim
                em = jnp.log(jnp.asarray(float(em_dim), dtype)) \
                    - jnp.log(jnp.maximum(A, 1e-4 * em_dim))
                em = jnp.clip(em, -8.0, 8.0)
                # far from the mode and not recovering from a
                # rejection (cap < 2 after any reject -> secant)
                use_em = (jnp.abs(em) > 0.5) & (c["cap"] >= 2.0) & ~boot
                step = jnp.where(use_em, -em, step)
            step = jnp.where(boot, 0.0 * step, step)
            full = (~use_em) & (jnp.abs(step) >= c["cap"] * 0.999)
            same_dir = jnp.sign(step) == c["last_dir"]
            cap2 = jnp.where(full & same_dir,
                             jnp.minimum(c["cap"] * 2.0, 16.0),
                             jnp.where(full, c["cap"], 2.0))
            ldir2 = jnp.where(full, jnp.sign(step), 0.0)
            cand = jnp.where(c["final"], c["th_root"], c["th"] - step)
            f_t, g_t, st_t = vg(cand, c["state"])
            guard = jnp.maximum(1e3 * f_noise * (1.0 + jnp.abs(c["f"])),
                                1e-8)
            ok = jnp.isfinite(f_t) & (f_t <= c["f"] + guard)
            # the flagged final secant eval is force-accepted — but
            # never a non-finite one (keep the last good iterate,
            # like the host loop's isfinite guard)
            acc = ok | (c["final"] & jnp.isfinite(f_t))
            dth = cand - c["th"]
            h_new = jnp.where(
                acc & (jnp.abs(dth) > 1e-12), (g_t - c["g"]) / dth,
                c["h_est"])
            h_new = jnp.where(jnp.isfinite(h_new) & (h_new > 0),
                              h_new, c["h_est"])
            # bracket: accepted fine-scale sign flip -> one secant
            # interpolation next iteration, then stop (never on the
            # boot iteration — its carry g is a placeholder zero)
            flip = (acc & ~c["final"] & ~boot
                    & (jnp.sign(g_t) != jnp.sign(c["g"]))
                    & (jnp.abs(dth) < 0.05 * (1.0 + jnp.abs(cand))))
            denom = g_t - c["g"]
            th_root = jnp.where(jnp.abs(denom) > 1e-300,
                                cand - g_t * dth / denom, cand)
            th2 = jnp.where(acc, cand, c["th"])
            f2 = jnp.where(acc, f_t, c["f"])
            g2 = jnp.where(acc, g_t, c["g"])
            st2 = jax.tree_util.tree_map(
                lambda new, old: jnp.where(acc, new, old),
                st_t, c["state"])
            small = (h_new > 0) & (jnp.abs(g2 / jnp.maximum(
                h_new, 1e-12)) < 1e-4)
            done = (c["final"] | (jnp.abs(g2) < tol)
                    | (~flip & acc & small))
            return {
                "th": th2, "f": f2, "g": g2, "state": st2,
                "h_est": h_new,
                # rejected: shrink the trust region for the retry
                "cap": jnp.where(acc, cap2, c["cap"] * 0.25),
                "last_dir": jnp.where(acc, ldir2, c["last_dir"]),
                "final": flip, "th_root": th_root,
                "done": done, "it": c["it"] + 1,
            }

        # zero tied to the input state so every carry component starts
        # with the same sharding 'varying' status as the body outputs
        # (shard_map rejects replicated-init/varying-output carries)
        lead = jax.tree_util.tree_leaves(state0)[0]
        z = jnp.asarray(0.0, dtype) * lead.ravel()[0].astype(dtype)
        c0 = {"th": th0 + z, "f": jnp.asarray(jnp.inf, dtype) + z,
              "g": z, "state": state0,
              "h_est": z, "cap": jnp.asarray(2.0, dtype) + z,
              "last_dir": z, "final": z > jnp.asarray(1.0, dtype),
              "th_root": z, "done": z > jnp.asarray(1.0, dtype),
              "it": jnp.asarray(0)}
        c = jax.lax.while_loop(cond, body, c0)
        mode, st = c["th"], c["state"]
        if pk is not None:
            # ---- packed FD pair: ONE lane-packed batched Laplace
            # evaluation instead of a 2-step sequential scan ----
            R = pk.R
            stR = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x[None], (R,) + x.shape), st)
            # FD pair in slots 0/1; extra slots idle at the mode
            thR = jnp.concatenate([
                jnp.stack([mode + h_fd, mode - h_fd]),
                jnp.broadcast_to(mode, (R - 2,))])
            g_all = jax.grad(
                lambda t: jnp.sum(pk.nll_warm(t, stR)[0]))(thR)
            H = (g_all[0] - g_all[1]) / (2 * h_fd)
        else:
            # FD Hessian at the mode (see hess_warm_fn for the
            # step-size rationale vs f32 gradient noise); the +/- pair
            # runs as a 2-step scan so the Laplace body is traced ONCE
            # here (compile time, not semantics — both evals
            # warm-start from st)
            def fd_step(_, th_j):
                _, g_j, _ = vg(th_j, st)
                return 0, g_j
            _, g_pm = jax.lax.scan(
                fd_step, 0, jnp.stack([mode + h_fd, mode - h_fd]))
            H = (g_pm[0] - g_pm[1]) / (2 * h_fd)
        return mode, H, st

    def run(th0, state0):
        mode, H, st = _optimize_and_hess(th0, state0)
        Hpos = jnp.maximum(jnp.abs(H), 1e-8)
        Lad = jax.lax.rsqrt(Hpos)
        nodes = mode + Lad * jnp.asarray(z1, dtype)       # (k,)
        if pk is not None:
            stR = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x[None], (pk.R,) + x.shape),
                st)
            return (mode, H, nodes) + _packed_node_phase(
                backend, pk, nodes, stR, k, return_states)
        # evaluate inner nodes first, chaining warm states outward on
        # each side (adjacent nodes share most of the solution); each
        # side is a lax.scan so the warm Laplace eval is traced once
        # per side instead of once per node (scan over full warm evals
        # is the validated on-chip pattern — see build_fused_nodes)
        order = [int(j) for j in np.argsort(np.abs(z1))]
        neg_idx = [j for j in order if z1[j] < 0]
        pos_idx = [j for j in order if z1[j] >= 0]

        def node_step(warm, th_j):
            nllj, packed, stj = _node_eval_packed(
                backend, jnp.reshape(th_j, (1,)), warm, return_states)
            ys = (nllj, packed) if return_states else (nllj,)
            return stj, ys

        def side(idx):
            if not idx:
                return None
            _, ys = jax.lax.scan(node_step, st,
                                 nodes[jnp.asarray(idx)])
            return ys

        ys_neg, ys_pos = side(neg_idx), side(pos_idx)
        per_node = [None] * k
        for rank, j in enumerate(neg_idx):
            per_node[j] = jax.tree_util.tree_map(
                lambda a: a[rank], ys_neg)
        for rank, j in enumerate(pos_idx):
            per_node[j] = jax.tree_util.tree_map(
                lambda a: a[rank], ys_pos)
        nlls = jnp.stack([o[0] for o in per_node])
        if not return_states:
            return mode, H, nodes, nlls
        states = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[o[1] for o in per_node])
        return mode, H, nodes, nlls, states

    if not sample_M:
        return jax.jit(run) if jit else run

    # fit + in-program posterior mixture draws (one dispatch):
    # node logits and key discipline mirror sampling.sample_marginal
    _, w1 = ghe_rule(k)
    logw1 = jnp.asarray(np.log(w1), dtype)

    def run_sampled(th0, state0, key):
        mode, H, nodes, nlls, states = run(th0, state0)
        Lad = jax.lax.rsqrt(jnp.maximum(jnp.abs(H), 1e-8))
        lw = -nlls + (logw1 + jnp.log(Lad))
        lnc = _logsumexp_j(lw)
        k_idx, k_draw = jax.random.split(key)
        idx = jax.random.categorical(k_idx, lw - lnc,
                                     shape=(sample_M,))
        samps = backend.sample_traceable(k_draw, states, idx,
                                         sample_M)
        return mode, H, nodes, nlls, states, idx, samps

    if predict_spec is None:
        return jax.jit(run_sampled) if jit else run_sampled

    # ---- fused fit + draws + PREDICT summaries (one dispatch) ----
    # The in-program draws feed the device predict summarizer (the same
    # O-spline-on-device block structure as postfit's single-dispatch
    # production predict): fit + posterior draws + predict mean/bands
    # leave the device in ONE dispatch. Reference anchor: the fit+predict
    # workflow of every vignette (R/03_post_fit.R:44-125).
    ps = predict_spec
    p_full = int(ps["p"])
    degree = int(ps.get("degree", 0))
    p_eff = p_full - degree
    include_intercept = bool(ps.get("include_intercept", True))
    level = float(ps.get("level", 0.95))
    knots_j = jnp.asarray(np.asarray(ps["knots"], np.float64),
                          jnp.float32)
    d_basis = len(np.asarray(ps["knots"])) - 1
    alpha_q = 1.0 - level
    probs = jnp.asarray([alpha_q / 2, level + alpha_q / 2], jnp.float32)
    fact = [math.factorial(i + degree) / math.factorial(i)
            for i in range(p_eff)]

    def run_predict(th0, state0, key, xs_blocks):
        mode, H, nodes, nlls, states, idx, samps = run_sampled(
            th0, state0, key)
        from .. import postfit
        coefs = samps[:, :d_basis].T.astype(jnp.float32)
        g_rows = [samps[:, d_basis + i].astype(jnp.float32)
                  for i in range(p_full - 1)]
        icol = (samps[:, d_basis + p_full - 1].astype(jnp.float32)
                if include_intercept else
                jnp.zeros((samps.shape[0],), jnp.float32))
        g = jnp.stack([icol] + g_rows)[degree:p_full]     # (p_eff, M)

        def block(xb):
            B = postfit._ospline_basis_jnp(knots_j, xb, p_eff)
            X = jnp.stack([fact[i] * xb ** i for i in range(p_eff)],
                          axis=1)
            draws = X @ g + B @ coefs
            qs = jnp.quantile(draws, probs, axis=1)
            return jnp.mean(draws, axis=1), qs[0], qs[1]

        pmean, plo, phi = jax.lax.map(block, xs_blocks)
        return (mode, H, nodes, nlls, states, idx, samps,
                pmean, plo, phi)

    return jax.jit(run_predict) if jit else run_predict


def build_fused_run_1d_batched(backend, k: int, tol: float = 1e-9,
                               max_iter: int = 40, jit: bool = True):
    """Vectorized build_fused_run_1d for a MULTI-REPLICATE backend
    (fast/batched.BatchedFastIWP): R independent s=1 fits advance in
    lock-step inside ONE program — every optimizer quantity is (R,),
    every Laplace eval factors all replicates in one lane-packed kernel
    pass. Same secant-Newton + EM-jump + bracketing logic as the scalar
    program, applied elementwise per replicate; the while_loop runs
    until EVERY replicate converges (converged replicates keep taking
    sub-noise steps, which is idempotent within the accept guard).

    run(th0 (R,), state0) -> (mode (R,), H (R,), nodes (R, k),
    nlls (R, k)). No sampling states (replicate fits consume
    modes/lognormconsts; use the scalar fused program for posterior
    draws of a single fit).

    MAINTENANCE: this body is the hand-vectorized (R,) twin of
    build_fused_run_1d's scalar body — any change to the optimizer
    logic there (steps, EM jump, caps, bracketing, tolerances) must be
    mirrored here. They are kept separate because the scalar program is
    the on-chip-proven headline path (tests/test_fast_iwp.py pins it);
    unify only with fresh on-chip validation of both."""
    dtype = backend.dtype
    R = backend.R
    cdt = getattr(backend, "compute_dtype", dtype)
    f_noise = 1e-9 if cdt in (np.float64, jnp.float64) else 3e-7
    h_fd = 1e-4 if cdt in (np.float64, jnp.float64) else 0.3
    z1, _ = ghe_rule(k)
    _dims = getattr(backend.base, "em_dims", None)
    em_dim = None if _dims is None else float(np.asarray(_dims)[0])
    if em_dim is not None:
        _alpha = float(np.asarray(backend.md.alpha).reshape(-1)[0])
        _u = float(np.asarray(backend.md.u).reshape(-1)[0])
        em_phi = -math.log(_alpha) / _u

    def _sum_nll(th, state):
        f, st = backend.nll_warm(th, state)
        return jnp.sum(f), (f, st)

    def vg(th, state):
        # ONE batched Laplace solve per call: value_and_grad runs the
        # custom-VJP forward once and the sum's gradient is the
        # per-replicate gradient vector (independent replicates)
        (_, (f, st)), g = jax.value_and_grad(
            _sum_nll, has_aux=True)(th, state)
        return f, g, st

    def run(th0, state0):
        f0, g0, st0 = vg(th0, state0)

        def cond(c):
            return jnp.logical_and(~jnp.all(c["done"]),
                                   c["it"] < max_iter)

        def body(c):
            have_h = c["h_est"] > 0
            h = jnp.where(have_h, c["h_est"],
                          jnp.maximum(jnp.abs(c["g"]), 1.0))
            step = jnp.clip(c["g"] / h, -c["cap"], c["cap"])
            use_em = jnp.zeros((R,), bool)
            if em_dim is not None:
                hp = 0.5 - 0.5 * em_phi * jnp.exp(-0.5 * c["th"])
                A = 2.0 * (c["g"] - hp) + em_dim
                em = jnp.log(jnp.asarray(float(em_dim), dtype)) \
                    - jnp.log(jnp.maximum(A, 1e-4 * em_dim))
                em = jnp.clip(em, -8.0, 8.0)
                use_em = (jnp.abs(em) > 0.5) & (c["cap"] >= 2.0)
                step = jnp.where(use_em, -em, step)
            full = (~use_em) & (jnp.abs(step) >= c["cap"] * 0.999)
            same_dir = jnp.sign(step) == c["last_dir"]
            cap2 = jnp.where(full & same_dir,
                             jnp.minimum(c["cap"] * 2.0, 16.0),
                             jnp.where(full, c["cap"], 2.0))
            ldir2 = jnp.where(full, jnp.sign(step), 0.0)
            cand = jnp.where(c["final"], c["th_root"], c["th"] - step)
            f_t, g_t, st_t = vg(cand, c["state"])
            guard = jnp.maximum(1e3 * f_noise * (1.0 + jnp.abs(c["f"])),
                                1e-8)
            ok = jnp.isfinite(f_t) & (f_t <= c["f"] + guard)
            # FREEZE converged replicates: they keep evaluating (lock
            # step) but never move again; a non-finite final secant
            # eval keeps the last good iterate (host-loop guard)
            acc = (ok | (c["final"] & jnp.isfinite(f_t))) & ~c["done"]
            dth = cand - c["th"]
            h_new = jnp.where(
                acc & (jnp.abs(dth) > 1e-12), (g_t - c["g"]) / dth,
                c["h_est"])
            h_new = jnp.where(jnp.isfinite(h_new) & (h_new > 0),
                              h_new, c["h_est"])
            flip = (acc & ~c["final"]
                    & (jnp.sign(g_t) != jnp.sign(c["g"]))
                    & (jnp.abs(dth) < 0.05 * (1.0 + jnp.abs(cand))))
            denom = g_t - c["g"]
            th_root = jnp.where(jnp.abs(denom) > 1e-300,
                                cand - g_t * dth / denom, cand)
            th2 = jnp.where(acc, cand, c["th"])
            f2 = jnp.where(acc, f_t, c["f"])
            g2 = jnp.where(acc, g_t, c["g"])
            st2 = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    acc.reshape((R,) + (1,) * (new.ndim - 1)), new, old),
                st_t, c["state"])
            small = (h_new > 0) & (jnp.abs(g2 / jnp.maximum(
                h_new, 1e-12)) < 1e-4)
            done = (c["final"] | (jnp.abs(g2) < tol)
                    | (~flip & acc & small))
            rej = ~acc & ~c["done"]
            return {
                "th": th2, "f": f2, "g": g2, "state": st2,
                "h_est": h_new,
                "cap": jnp.where(acc, cap2,
                                 jnp.where(rej, c["cap"] * 0.25,
                                           c["cap"])),
                "last_dir": jnp.where(acc, ldir2, c["last_dir"]),
                "final": flip, "th_root": th_root,
                "done": c["done"] | done, "it": c["it"] + 1,
            }

        z = jnp.zeros((R,), dtype) * f0
        c0 = {"th": th0 + z, "f": f0, "g": g0, "state": st0,
              "h_est": z, "cap": jnp.full((R,), 2.0, dtype) + z,
              "last_dir": z, "final": z > jnp.asarray(1.0, dtype),
              "th_root": z, "done": jnp.abs(g0) < tol,
              "it": jnp.asarray(0)}
        c = jax.lax.while_loop(cond, body, c0)
        mode, st = c["th"], c["state"]
        # FD pair + per-side node chains as scans (one traced Laplace
        # copy each — mirrors build_fused_run_1d)
        def fd_step(_, th_j):
            _, g_j, _ = vg(th_j, st)
            return 0, g_j
        _, g_pm = jax.lax.scan(
            fd_step, 0, jnp.stack([mode + h_fd, mode - h_fd]))
        H = (g_pm[0] - g_pm[1]) / (2 * h_fd)
        Hpos = jnp.maximum(jnp.abs(H), 1e-8)
        Lad = jax.lax.rsqrt(Hpos)
        nodes = mode[:, None] + Lad[:, None] * jnp.asarray(
            z1, dtype)[None]                               # (R, k)
        order = [int(j) for j in np.argsort(np.abs(z1))]
        neg_idx = [j for j in order if z1[j] < 0]
        pos_idx = [j for j in order if z1[j] >= 0]

        def node_step(warm, th_j):
            nllj, stj, _ = backend.laplace_eval_full(th_j, warm)
            return stj, nllj

        def side(idx):
            if not idx:
                return None
            _, nlls_side = jax.lax.scan(
                node_step, st,
                jnp.transpose(nodes[:, jnp.asarray(idx)], (1, 0)))
            return nlls_side                               # (m, R)

        nll_neg, nll_pos = side(neg_idx), side(pos_idx)
        outs = [None] * k
        for rank, j in enumerate(neg_idx):
            outs[j] = nll_neg[rank]
        for rank, j in enumerate(pos_idx):
            outs[j] = nll_pos[rank]
        nlls = jnp.stack(outs, axis=1)                     # (R, k)
        return mode, H, nodes, nlls

    return jax.jit(run) if jit else run


# per-DISPATCH iteration bound for the fused s>1 optimizer: one
# dispatch's wall time must stay well under the tunnel's RPC deadline
# (exceeding it KILLS the worker — round 14); the host re-dispatches
# segments until converged (aghq_fit fused path).
_OPT_ND_MAX_ITER = 60


def build_fused_opt_nd(backend, s: int, tol: float = 1e-9,
                       max_iter: int = None,
                       jit: bool = True):
    """The s>1 outer optimization as ONE jitted device program: the
    gradient-only BFGS of `optimize_theta` (same accept/update/stall
    logic) inside a lax.while_loop, plus the central-difference outer
    Hessian at the mode — a single dispatch instead of ~2 per BFGS
    iteration plus 2s for the Hessian (each ~30 ms of tunnel overhead,
    BENCH_NOTES.md). The reference runs this loop in R calling TMB per
    evaluation (aghq::marginal_laplace_tmb, R/02_model_fit.R:284).

    Differences from the host loop: the line search halves alpha across
    while-loop iterations instead of inside one (a rejection costs one
    cheap extra iteration), and a non-descent direction resets the
    curvature for the SAME step rather than retrying.

    Returns (mode (s,), H (s, s), state) — state is the warm latent
    solution at the mode for downstream node evaluation.
    """
    # resolved at BUILD time so tests can shrink the per-dispatch budget
    # by monkeypatching the module global (the exhaustion checks in
    # aghq_fit/_aghq_fit_full_nd read the same global at run time)
    if max_iter is None:
        # heavy per-iteration backends (scatter_iid at q ~ 1e4: each
        # BFGS eval is a Newton chain of dense Schur assemblies) cap
        # the per-dispatch budget LOWER so a single dispatch cannot
        # run into the tunnel's RPC deadline (the worker-kill class,
        # tools/crash_ladder.py); the host segment/restart loop
        # re-dispatches the same compiled program with warm state
        max_iter = getattr(backend, "opt_nd_max_iter",
                           _OPT_ND_MAX_ITER)
    dtype = backend.dtype
    cdt = getattr(backend, "compute_dtype", dtype)
    f_eps = 1e-9 if cdt in (np.float64, jnp.float64) else 3e-7
    h_fd = 1e-4 if cdt in (np.float64, jnp.float64) else 0.3
    eye = jnp.eye(s, dtype=dtype)
    # coordinate-wise EM-style jump (see em_dims / build_fused_run_1d):
    # per theta_j, one gradient gives the fixed-point root
    # th_j + log(d_j / (2(g_j - hp'_j) + d_j)) — replaces the long BFGS
    # march from cold starts (the s=2 headline mode sits at ~(15, 2.4)
    # from th0=0) with a few self-correcting jumps.
    em_dims = getattr(backend, "em_dims", None)
    if em_dims is not None:
        em_dims_j = jnp.asarray(np.asarray(em_dims, np.float64), dtype)
        em_phi = jnp.asarray(
            -np.log(np.asarray(backend.md.alpha, np.float64))
            / np.asarray(backend.md.u, np.float64), dtype)

    def vg(th, state):
        (f, st), g = jax.value_and_grad(backend.nll_warm, has_aux=True)(
            th.astype(dtype), state)
        # magnitude cap: sick-region (weak-theta) gradients through
        # guarded factorizations can be finite but ASTRONOMICAL (1e18
        # measured round 14), which wrecks every BFGS direction while
        # passing finiteness gates; healthy gradients are <= ~1e5 at
        # any measured config, so the cap is bit-identity there
        g = jnp.clip(g, -1e8, 1e8)
        return f, g, st

    def run(th0, state0):
        # sharding-varying zero tied to the input state (see
        # build_fused_run_1d); iteration 0 is the BOOT evaluation — the
        # cold eval folded into the loop so the warm Laplace body is
        # traced once (the evaluation sequence is unchanged)
        lead = jax.tree_util.tree_leaves(state0)[0]
        z = jnp.asarray(0.0, dtype) * lead.ravel()[0].astype(dtype)
        c0 = {"th": th0 + z, "f": jnp.asarray(jnp.inf, dtype) + z,
              "g": jnp.zeros((s,), dtype) + z, "state": state0,
              "Hinv": eye + z,
              "alpha": jnp.asarray(1.0, dtype) + z,
              "stall": jnp.asarray(0),
              "rst": jnp.asarray(0),
              "fbest": jnp.asarray(jnp.inf, dtype) + z,
              "age": jnp.asarray(0),
              "done": z > jnp.asarray(1.0, dtype),
              "it": jnp.asarray(0)}

        def cond(c):
            return jnp.logical_and(~c["done"], c["it"] < max_iter)

        def body(c):
            boot = c["it"] == 0
            g = c["g"]
            gmax = jnp.max(jnp.abs(g))
            step = c["Hinv"] @ g
            dec = jnp.dot(step, g)
            bad = ~jnp.isfinite(dec) | (dec <= 0)
            # curvature lost positive-definiteness: cautious reset
            Hu = jnp.where(bad, eye / jnp.maximum(gmax, 1.0), c["Hinv"])
            step = jnp.where(bad, g / jnp.maximum(gmax, 1.0), step)
            dec = jnp.where(bad, jnp.dot(step, g), dec)
            use_em = jnp.asarray(False)
            if em_dims is not None:
                # hp'(th) = 1/2 - phi/2 e^{-th/2} (exp PC hyperprior)
                hp = 0.5 - 0.5 * em_phi * jnp.exp(-0.5 * c["th"])
                A = 2.0 * (g - hp) + em_dims_j
                em = jnp.log(em_dims_j) \
                    - jnp.log(jnp.maximum(A, 1e-4 * em_dims_j))
                em = jnp.clip(em, -8.0, 8.0)
                # far from the mode, and not inside a rejection backoff
                # (alpha < 1 until the next accepted step)
                use_em = ((jnp.max(jnp.abs(em)) > 0.5)
                          & (c["alpha"] >= 1.0) & ~boot)
                step = jnp.where(use_em, -em / c["alpha"], step)
            step = jnp.where(boot, 0.0 * step, step)
            cand = c["th"] - c["alpha"] * step
            # finite-start ramp: when the INCUMBENT value is non-finite
            # (the boot eval at theta0 can be NaN/inf — weak-theta
            # Hessians are essentially singular and the f32 on-chip
            # value overflows even through the guarded factorizations),
            # the gradient carries no information (g=0 from init), so
            # raise ALL log-precisions instead: more precision = more
            # regularization = guaranteed-finite Laplace. The distance
            # 2/alpha doubles with each rejected ramp (alpha halves),
            # reaching strongly-regularized territory in a few tries.
            # Healthy runs (finite boot) never take this branch.
            # ...or when the incumbent GRADIENT is non-finite (the
            # custom-VJP log-det gradient through a pivot-clamped
            # factorization of a sick system can be NaN even where the
            # value is finite) — no usable direction either way
            ramp = jnp.logical_and(
                ~jnp.isfinite(c["f"]) | ~jnp.all(jnp.isfinite(c["g"])),
                ~boot)
            cand = jnp.where(
                ramp,
                c["th"] + jnp.minimum(2.0 / c["alpha"], 32.0),
                cand)
            f_t, g_t, st_t = vg(cand, c["state"])
            # acceptance requires a finite value AND gradient: an
            # accepted NaN gradient would poison every later direction.
            # Tolerance is fp-noise-aware (10x the dtype's achievable
            # resolution); EM-jump candidates get a LOOSE 50% gate —
            # near a sick/weak-theta start the guarded log-det makes f
            # quasi-random by ~20% (measured round 14), and EM is a
            # self-correcting fixed-point iteration that must be
            # allowed to walk THROUGH that noise (only genuine
            # blow-ups are rejected).
            acc_tol = jnp.where(use_em,
                                0.5 * (1.0 + jnp.abs(c["f"])),
                                10.0 * f_eps * (1.0 + jnp.abs(c["f"])))
            ok = (jnp.isfinite(f_t) & jnp.all(jnp.isfinite(g_t))
                  & (f_t <= c["f"] + acc_tol))
            sk = cand - c["th"]
            yk = g_t - g
            sy = jnp.dot(sk, yk)
            good_sy = sy > 1e-12 * (jnp.linalg.norm(sk)
                                    * jnp.linalg.norm(yk) + 1e-300)
            rho = 1.0 / jnp.where(good_sy, sy, 1.0)
            Vm = eye - rho * jnp.outer(sk, yk)
            Hb = Vm @ Hu @ Vm.T + rho * jnp.outer(sk, sk)
            H2 = jnp.where(ok & good_sy, Hb, Hu)
            # boot: the cautious init the host path uses (eye / |g|max)
            H2 = jnp.where(
                boot, eye / jnp.maximum(jnp.max(jnp.abs(g_t)), 1.0), H2)
            # improvement must clear the SAME noise band the acceptance
            # test tolerates (10x f_eps): with the bare f_eps band the
            # f32 value noise (~6e-3 at |f|~2e4) randomly resets the
            # stall counter, `soft` never fires, and every dispatch
            # burns max_iter then re-segments — measured 11.9 s steady
            # on gauss2 (60/60 iterations even warm-started AT the
            # mode, |g| noise floor 4.1)
            improved = (c["f"] - f_t) > 10.0 * f_eps * (1.0 + jnp.abs(c["f"]))
            stall2 = jnp.where(ok & improved, 0,
                               jnp.where(ok, c["stall"] + 1, c["stall"]))
            alpha2 = jnp.where(ok, jnp.asarray(1.0, dtype),
                               c["alpha"] * 0.5)
            th2 = jnp.where(ok, cand, c["th"])
            f2 = jnp.where(ok, f_t, c["f"])
            g2 = jnp.where(ok, g_t, c["g"])
            st2 = jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), st_t, c["state"])
            gmax2 = jnp.max(jnp.abs(g2))
            # BEST-f staleness: the incumbent f is NOT monotone (the
            # acceptance band admits +10 f_eps noise drifts, after
            # which noise "improvements" reset the stall counter
            # forever — measured: gauss2 burns all 60 iterations with
            # a bit-stable trajectory whatever the stall thresholds).
            # Track the best value ever seen; 12 iterations without
            # beating it is stationarity at this noise level.
            # (guard: fbest starts at +inf; inf - inf = NaN would make
            # improved_best False on the very first real evaluation)
            thr_best = jnp.where(
                jnp.isfinite(c["fbest"]),
                c["fbest"] - 10.0 * f_eps * (1.0 + jnp.abs(c["fbest"])),
                jnp.asarray(jnp.inf, f2.dtype))
            improved_best = f2 < thr_best
            fbest2 = jnp.minimum(c["fbest"], f2)
            age2 = jnp.where(improved_best, 0, c["age"] + 1)
            soft = ((stall2 >= 2) | (alpha2 < 1e-6) | (age2 >= 12)
                    | (dec < 1e-13 * (1.0 + jnp.abs(f2))))
            # a soft exit (stall/backoff) with a LARGE remaining
            # gradient is premature — f32 noise rejections in flat
            # valleys stall the march long before stationarity
            # (measured round 14: exit at |g|=72 on the s=3 two-smooth
            # model, 13 nats above the mode). Restart in-loop instead:
            # fresh cautious curvature + full step; max_iter bounds it.
            # ...restart only where the NEWTON DECREMENT says real
            # descent remains (scale-free stationarity: dec ~ the
            # expected next decrease; compare against the noise band).
            # The round-14 |g|-based gate (1e-4*(1+|f|)) is mis-scaled
            # for families whose gradient noise floor is large (gauss2
            # n=1e5: |g| floor ~1e2 at the true mode, |f|~2e4 band ~2
            # -> restarted forever, read as "exhausted", re-segmented:
            # measured 1.84 -> 11.9 s steady). The sick s=3 two-smooth
            # start has dec ~ |g| ~ 70 >> band — still restarts.
            big_dec = dec >= 1e3 * f_eps * (1.0 + jnp.abs(f2))
            done = (gmax2 < tol) | (soft & (~big_dec | (c["rst"] >= 4)))
            restart = soft & big_dec & (c["rst"] < 4)
            H2 = jnp.where(restart,
                           eye / jnp.maximum(gmax2, 1.0), H2)
            alpha2 = jnp.where(restart, jnp.asarray(1.0, dtype), alpha2)
            stall2 = jnp.where(restart, 0, stall2)
            age2 = jnp.where(restart, 0, age2)
            rst2 = jnp.where(restart, c["rst"] + 1, c["rst"])
            # boot's zero step has dec = 0 — only the gradient test
            # applies there (matches the host loop's entry condition)
            done = jnp.where(boot, gmax2 < tol, done)
            # never declare convergence without a FINITE incumbent: a
            # rejected non-finite boot leaves g=0 and dec=0, which
            # would satisfy every test above; the finite-start ramp
            # must keep running (bounded by max_iter)
            done = jnp.logical_and(done, jnp.isfinite(f2))
            return {"th": th2, "f": f2, "g": g2, "state": st2,
                    "Hinv": H2, "alpha": alpha2, "stall": stall2,
                    "rst": rst2, "fbest": fbest2, "age": age2,
                    "done": done, "it": c["it"] + 1}

        c = jax.lax.while_loop(cond, body, c0)
        mode, st = c["th"], c["state"]
        # central-difference outer Hessian at the mode (exact implicit
        # gradients underneath; step size rationale in hess_warm_fn).
        # lax.scan over the 2s FD points — ONE traced Laplace body
        # instead of 2s copies (compile time; every point warm-starts
        # from the mode's state, which the carry passes through
        # unchanged)
        offs = np.zeros((2 * s, s))
        for i in range(s):
            offs[2 * i, i] = h_fd
            offs[2 * i + 1, i] = -h_fd

        def fd_body(wm, dth):
            _, g, _ = vg(mode + dth, wm)
            return wm, g

        _, gs = jax.lax.scan(fd_body, st, jnp.asarray(offs, dtype))
        H = (gs[0::2] - gs[1::2]) / (2 * h_fd)
        # stats = (iterations used, final |g|_inf): the host SEGMENTS
        # the optimization across dispatches — max_iter bounds ONE
        # dispatch's wall time (a single long dispatch trips the
        # tunnel's RPC deadline and KILLS the worker, measured round 14
        # with max_iter=200 on a sick cold start) and it==max_iter
        # tells the caller to re-dispatch from the incumbent.
        stats = jnp.stack([c["it"].astype(dtype),
                           jnp.max(jnp.abs(c["g"]))])
        return mode, 0.5 * (H + H.T), st, stats

    return jax.jit(run) if jit else run


def _jacobi_eigh_small(A, s: int, sweeps: int = 10):
    """Eigendecomposition of a symmetric (s, s) device matrix by
    statically unrolled cyclic Jacobi sweeps (s <= 4): returns
    (evals (s,), V (s, s)) with A ~= V diag(evals) V^T. Branch-free
    rotations (atan2(0, 0) = 0 makes converged pairs a no-op); machine
    precision after ~6 sweeps for these tiny adaptation matrices. Used
    by the single-dispatch s>1 fit to run the quadrature adaptation
    (host np.linalg.eigh in the 3-dispatch path) ON device."""
    V = jnp.eye(s, dtype=A.dtype)
    for _ in range(sweeps):
        for p in range(s - 1):
            for q in range(p + 1, s):
                th = 0.5 * jnp.arctan2(2.0 * A[p, q], A[p, p] - A[q, q])
                c, sn = jnp.cos(th), jnp.sin(th)
                R = (jnp.eye(s, dtype=A.dtype)
                     .at[p, p].set(c).at[q, q].set(c)
                     .at[p, q].set(-sn).at[q, p].set(sn))
                A = R.T @ A @ R
                V = V @ R
    return jnp.diagonal(A), V


def _chol_small(Am, s: int):
    """Closed-form (statically unrolled) Cholesky of a tiny (s, s) PD
    device matrix — same recurrence as LAPACK potrf, so it matches the
    host np.linalg.cholesky of the 3-dispatch path to fp rounding."""
    L = [[None] * s for _ in range(s)]
    for i in range(s):
        for j in range(i + 1):
            acc = Am[i, j]
            for t in range(j):
                acc = acc - L[i][t] * L[j][t]
            L[i][j] = jnp.sqrt(acc) if i == j else acc / L[j][j]
    rows = [jnp.stack([L[i][j] if j <= i
                       else jnp.zeros((), Am.dtype)
                       for j in range(s)]) for i in range(s)]
    return jnp.stack(rows)


def _node_tour(z: np.ndarray):
    """Static evaluation order over quadrature nodes: greedy nearest-
    neighbor tour starting at the node closest to the mode. The fused
    node program lax.scans along this tour with the inner solution as
    carry, so consecutive warm starts are between NEARBY nodes (same
    idea as the 1d fused fit's two-sided chaining, generalized to
    product grids)."""
    z = np.atleast_2d(np.asarray(z, np.float64))
    J = z.shape[0]
    left = set(range(J))
    cur = int(np.argmin(np.linalg.norm(z, axis=1)))
    tour = [cur]
    left.discard(cur)
    while left:
        rest = sorted(left)
        d2 = [float(np.sum((z[cur] - z[j]) ** 2)) for j in rest]
        cur = rest[int(np.argmin(d2))]
        tour.append(cur)
        left.discard(cur)
    return np.asarray(tour)


def build_fused_nodes(backend, tour, return_states: bool = True,
                      jit: bool = True, sample_M: int = 0):
    """One-program evaluation of J quadrature nodes (a single dispatch
    instead of J): a lax.scan of warm-chained Laplace solves along the
    static `tour` order (_node_tour), with per-node Hessian factors when
    `return_states` (needed for posterior sampling; dropped for the
    cheaper marginal re-adaptation evals). scan — not unrolling — keeps
    ONE traced copy of the inner solve (a statically unrolled k^s-node
    program blew past 50 min of compile at moderate scale; the scan
    body compiles once and runs fine over the Pallas band kernels at
    d=2048, measured on-chip)."""
    tour = np.asarray(tour)
    inv = np.argsort(tour)

    def run(nodes, warm):
        nodes_t = nodes[tour]

        def body(wm, th):
            nll, packed, st = _node_eval_packed(backend, th, wm,
                                                return_states)
            return st, (nll, jnp.zeros(()) if packed is None else packed)

        _, (nlls, sts) = jax.lax.scan(body, warm, nodes_t)
        if not return_states:
            return nlls[inv]
        sts = jax.tree_util.tree_map(lambda a: a[inv], sts)
        return nlls[inv], sts

    if not sample_M:
        return jax.jit(run) if jit else run
    if not return_states:
        raise ValueError("sample_M requires return_states")

    def run_sampled(nodes, warm, logw, key):
        """Node evals + in-program posterior mixture draws (logw: (J,)
        adapted log weights from the host-side adaptation)."""
        nlls, sts = run(nodes, warm)
        lw = -nlls + logw
        lnc = _logsumexp_j(lw)
        k_idx, k_draw = jax.random.split(key)
        idx = jax.random.categorical(k_idx, lw - lnc, shape=(sample_M,))
        samps = backend.sample_traceable(k_draw, sts, idx, sample_M)
        return nlls, sts, idx, samps

    return jax.jit(run_sampled) if jit else run_sampled


def _fused_nodes_cached(backend, z: np.ndarray, return_states: bool,
                        sample_M: int = 0, tour=None, key_tag=None):
    """Per-backend cache of compiled fused node programs, keyed by node
    count (the z grid is fixed given (k, s), so shapes and the chain are
    static) and the in-program draw count.

    tour/key_tag let callers with a precomputed visiting order (e.g. the
    concatenated multi-grid tour of _marginals_fused) share this cache
    protocol instead of re-implementing it; key_tag disambiguates those
    programs from the plain single-grid ones of the same node count."""
    cache = getattr(backend, "_fused_node_progs", None)
    if cache is None:
        cache = backend._fused_node_progs = {}
    key = (key_tag, len(tour) if tour is not None else len(z),
           return_states, sample_M)
    if key not in cache:
        if tour is None:
            tour = _node_tour(z)
        tour_b = np.ascontiguousarray(np.asarray(tour)).tobytes()
        cache[key] = _lifted_jit(
            backend, lambda be: build_fused_nodes(
                be, tour, return_states=return_states, jit=False,
                sample_M=sample_M),
            prog_key=("nodes", tour_b, return_states, sample_M))
    return cache[key]


def build_fused_full_nd(backend, s: int, k: int, tol: float = 1e-9,
                        max_iter: int = None, sample_M: int = 0,
                        jit: bool = True):
    """The ENTIRE s>1 AGHQ fit as ONE jitted device program (s <= 3):
    BFGS optimization + FD outer Hessian (build_fused_opt_nd), the s x s
    quadrature adaptation ON device (Jacobi eigendecomposition with the
    host path's PD-clip semantics + closed-form Cholesky), the k^s
    warm-chained main-grid evaluations, the s re-adapted marginal grids,
    and (sample_M > 0) the posterior mixture draws — one dispatch
    instead of three (opt+FD, nodes+draws, marginals), ~30 ms tunnel
    overhead each (BENCH_NOTES.md). Mirrors the one-call semantics of
    aghq::marginal_laplace_tmb (/root/reference/R/02_model_fit.R:284).

    Adaptation parity with the 3-dispatch host path: cov = V diag(1/l) V'
    from the eigendecomposition of H equals np.linalg.inv(H) to fp
    rounding; when any eigenvalue is nonpositive the host's clip branch
    (|evals| of cov clipped below at 1e-8 of the max) is applied — the
    selection between the two matches the host's try/except on
    np.linalg.cholesky. Values agree with the 3-dispatch path to ~1e-12
    relative in f64 (LAPACK vs unrolled arithmetic), not bit-for-bit.

    Returns run(th0, state0[, key]) ->
      (mode (s,), H (s,s), L (s,s), nodes (J,s), nlls (J,), states,
       marg_nlls (s, J), Lps (s, s, s)[, idx (M,), samps (w, M)]).
    """
    if s > 3:
        raise ValueError("single-dispatch s>1 fit implements the "
                         "closed-form adaptation for s <= 3")
    dtype = backend.dtype
    opt_run = build_fused_opt_nd(backend, s, tol, max_iter, jit=False)
    z, logw_base = product_grid(k, s)
    J = len(z)
    tour = _node_tour(z)
    nodes_body = build_fused_nodes(backend, tour, return_states=True,
                                   jit=False)
    t_marg = np.concatenate([tour + j * J for j in range(s)])
    marg_body = build_fused_nodes(backend, t_marg, return_states=False,
                                  jit=False)
    perms = [np.array([j] + [i for i in range(s) if i != j])
             for j in range(s)]
    z_dev = jnp.asarray(z, dtype)
    logw1 = jnp.asarray(logw_base, dtype)

    def adapt(H):
        """Device (cov_sel, L) with host clip semantics (see aghq_fit)."""
        Hs = 0.5 * (H + H.T)
        lam, V = _jacobi_eigh_small(Hs, s)
        ok = jnp.all(lam > 0)
        inv_lam = 1.0 / jnp.where(lam == 0, 1e-300, lam)
        cov_direct = (V * inv_lam[None, :]) @ V.T
        ev = jnp.abs(inv_lam)
        ev = jnp.maximum(ev, 1e-8 * jnp.maximum(jnp.max(ev), 1e-8))
        cov_clip = (V * ev[None, :]) @ V.T
        cov = jnp.where(ok, cov_direct, cov_clip)
        cov = 0.5 * (cov + cov.T)
        return cov, _chol_small(cov, s)

    def run_core(th0, state0):
        mode, H, st, ostats = opt_run(th0, state0)
        cov, L = adapt(H)
        nodes = mode[None, :] + z_dev @ L.T
        nlls, sts = nodes_body(nodes, st)
        # marginal grids: dim j reordered first (cov permuted), same
        # k^s node count so the three scans share shapes
        marg_nodes = []
        Lps = []
        for j in range(s):
            pj = perms[j]
            covp = cov[np.ix_(pj, pj)]
            Lp = _chol_small(covp, s)
            nodes_p = mode[pj][None, :] + z_dev @ Lp.T
            marg_nodes.append(nodes_p[:, np.argsort(pj)])
            Lps.append(Lp)
        marg_nlls = marg_body(jnp.concatenate(marg_nodes), st)
        return (mode, H, L, nodes, nlls, sts,
                marg_nlls.reshape(s, J), jnp.stack(Lps), ostats)

    if not sample_M:
        return jax.jit(run_core) if jit else run_core

    def run_sampled(th0, state0, key):
        out = run_core(th0, state0)
        mode, H, L, nodes, nlls, sts = out[:6]
        logw = logw1 + jnp.sum(jnp.log(jnp.diagonal(L)))
        lw = -nlls + logw
        lnc = _logsumexp_j(lw)
        k_idx, k_draw = jax.random.split(key)
        idx = jax.random.categorical(k_idx, lw - lnc, shape=(sample_M,))
        samps = backend.sample_traceable(k_draw, sts, idx, sample_M)
        return out + (idx, samps)

    return jax.jit(run_sampled) if jit else run_sampled


def optimize_theta(backend, s: int, theta0=None, tol=1e-9, max_iter=100,
                   verbose=False):
    """Gradient-only BFGS optimization of the Laplace marginal nll,
    matching the reference's `optim(method="BFGS")` inside
    aghq::marginal_laplace_tmb (R/02_model_fit.R:284). The common s=1
    case uses secant-Newton on the gradient root (_optimize_theta_1d).

    Each nll+gradient evaluation is a warm-started inner Newton solve —
    the dominant cost of a fit at scale — so curvature comes FREE from
    gradient differences (BFGS secant updates); the exact Hessian is
    evaluated exactly ONCE, at the mode, for the quadrature adaptation
    (profiled on TPU: FD Hessians during iteration were ~95% of total
    fit time under the previous damped-Newton scheme).
    """
    if theta0 is None:
        theta0 = np.zeros(s)
    if s == 1:
        return _optimize_theta_1d(backend, theta0, tol, max_iter, verbose)
    theta = jnp.asarray(theta0, backend.dtype)

    # warm-started evaluation: the inner Newton for each nll call starts
    # from the previous theta's latent mode (2-4 iterations instead of
    # 10-20 from zero)
    val_grad = backend.val_grad_warm_fn()
    hess = backend.hess_warm_fn()
    state = backend.init_state()

    # fp resolution of the nll surface for the active precision: once f
    # stops improving beyond this, we are polishing inside the noise pit
    # (PARITY.md) and must stop. Mixed-precision backends are limited by
    # their O(n) compute dtype, not the solver dtype.
    cdt = getattr(backend, "compute_dtype", backend.dtype)
    f_eps = 1e-9 if cdt in (np.float64, jnp.float64) else 3e-7

    (f, state), g = val_grad(theta, state)
    f = float(f)
    g_np = np.asarray(g, np.float64)
    Hinv = np.eye(s) / max(float(np.abs(g_np).max()), 1.0)  # cautious init
    stall = 0
    for it in range(max_iter):
        gmax = float(np.abs(g_np).max())
        if gmax < tol:
            break
        step = Hinv @ g_np                     # descent dir (minimize f)
        dec = float(np.dot(step, g_np))
        if not np.isfinite(dec) or dec <= 0:
            # reset curvature if the update lost positive-definiteness
            Hinv = np.eye(s) / max(gmax, 1.0)
            step = Hinv @ g_np
            dec = float(np.dot(step, g_np))
        if dec < 1e-13 * (1.0 + abs(f)):
            break
        alpha = 1.0
        accepted = False
        for _ in range(25):
            cand = theta - alpha * jnp.asarray(step, theta.dtype)
            (f_try, state_try), g_try = val_grad(cand, state)
            f_try = float(f_try)
            if np.isfinite(f_try) and f_try <= f + 1e-12 * (1.0 + abs(f)):
                improved = (f - f_try) > f_eps * (1.0 + abs(f))
                g_new = np.asarray(g_try, np.float64)
                sk = -alpha * step
                yk = g_new - g_np
                sy = float(np.dot(sk, yk))
                if sy > 1e-12 * float(np.linalg.norm(sk)
                                      * np.linalg.norm(yk) + 1e-300):
                    # BFGS inverse update (Sherman-Morrison form)
                    rho = 1.0 / sy
                    I = np.eye(s)
                    V = I - rho * np.outer(sk, yk)
                    Hinv = V @ Hinv @ V.T + rho * np.outer(sk, sk)
                theta = cand
                f, g_np, state = f_try, g_new, state_try
                accepted = True
                break
            alpha *= 0.5
        if not accepted:
            break
        # two consecutive noise-floor steps => converged within fp noise
        stall = 0 if improved else stall + 1
        if stall >= 2:
            break
        if verbose:
            print(f"  outer it={it} f={f:.10f} "
                  f"|g|={float(np.abs(g_np).max()):.2e} dec={dec:.2e}")
    H = hess(theta, state)   # exact Hessian ONCE, at the mode
    return np.asarray(theta), np.asarray(H), float(f), state


def aghq_fit(md_or_backend, k: int = 4, theta0=None, verbose=False,
             sample=None, predict=None) -> AGHQFit:
    """Full AGHQ pipeline: optimize, adapt, quadrature, marginals.

    sample=(key, M): draw the M posterior mixture samples INSIDE the
    fused fit program when the backend supports it (s=1 fused path +
    sample_traceable) and attach them as fit.presampled =
    (samps (w, M), idx (M,)) — sampling.sample_marginal then reuses
    them instead of dispatching again. Ignored where unsupported.

    predict=(spec, xs): additionally compute predict summaries
    (mean + level band at the xs grid) INSIDE the same program from the
    in-program draws (s=1 fused path, IWP backends; requires sample=).
    Attached as fit.prepredicted. spec: dict(knots=, p=, degree=0,
    include_intercept=True, level=0.95, rows=1024)."""
    backend = (md_or_backend if hasattr(md_or_backend, "node_eval")
               else DenseBackend(md_or_backend))
    s = backend.n_theta
    if s == 0:
        raise ValueError("aghq requires at least one hyperparameter")
    if sample is not None and int(sample[1]) <= 0:
        sample = None            # M=0: fit without draws

    if s == 1 and getattr(backend, "supports_fused_1d", False):
        # single-dispatch fused fit (fast backends): optimize + adapt +
        # node evaluation (+ optional posterior draws) in one program.
        # Refit warm-start (roofline lever #1): the fit is iteration-
        # count bound (~175 of 344 ms is the secant/Newton march from
        # theta0=0 to the mode ~14 at headline scale); a SECOND fit of
        # the same backend starts at the incumbent mode, so the march
        # collapses to bracket + polish. theta0 is a runtime jit
        # argument — no recompile. OPT-IN (backend.warm_start = True):
        # a warm-started refit converges to the same mode only up to
        # the optimizer's own stopping resolution (measured: d_mode
        # ~5e-3, d_lognormconst ~1e-4 on CPU f64), so the default
        # stays bit-reproducible for repeated fits.
        if theta0 is None and getattr(backend, "warm_start", False):
            theta0 = getattr(backend, "_warm_theta0", None)
        th0 = 0.0 if theta0 is None else float(np.atleast_1d(theta0)[0])
        fuse_sample = (sample is not None
                       and hasattr(backend, "sample_traceable"))
        out = fused_fit_1d(backend, k=k, theta0=th0,
                           sample=sample if fuse_sample else None,
                           predict=predict if fuse_sample else None)
        mode, H, nodes, nlls, states = out[:5]
        presampled = ((out[6], out[5], np.asarray(sample[0]))
                      if fuse_sample else None)
        prepredicted = (out[7] if fuse_sample and predict is not None
                        else None)
        Lad = 1.0 / np.sqrt(np.maximum(np.abs(H[0, 0]), 1e-8))
        z, logw_base = product_grid(k, 1)
        logw = logw_base + np.log(Lad)
        logpost_w = -np.asarray(nlls) + logw
        lognormconst = _logsumexp_np(logpost_w)
        fit = AGHQFit(mode=mode, hessian=H, L=np.asarray([[Lad]]),
                      nodes=nodes, logw=logw, lognll=np.asarray(nlls),
                      lognormconst=lognormconst, states=states, k=k,
                      backend=backend)
        if np.all(np.isfinite(mode)):
            backend._warm_theta0 = float(mode[0])
        fit.presampled = presampled
        fit.prepredicted = prepredicted
        fit.marginals = [marginal_posterior(fit, backend, 0)]
        return fit

    # opt-in refit warm-start for the s>1 paths (same semantics as the
    # s=1 fused path above: theta0 stays a runtime jit argument)
    if (s > 1 and theta0 is None
            and getattr(backend, "warm_start", False)):
        theta0 = getattr(backend, "_warm_theta0_nd", None)

    # prefer_host_opt: heavy-per-eval backends (scatter_iid at bigiid
    # scale) run the OUTER BFGS as per-eval dispatches — one eval costs
    # seconds, so the ~30 ms dispatch overhead is irrelevant while a
    # 16-eval fused dispatch measurably KILLS the v5-lite worker
    # (tools/bigiid_bisect.py: nll/grad/newton stages all pass, the
    # fused optnd program faults the worker mid-dispatch)
    fused_nd = (s > 1 and getattr(backend, "supports_fused_nd", False)
                and not getattr(backend, "prefer_host_opt", False))
    # single-dispatch s>1: everywhere on CPU (f64 test parity); on TPU
    # for backends whose factorization programs are VMEM-safe. The
    # round-13 worker crashes (s=3 two_smooths, merged-IID q=1e4) were
    # whole-array band kernels overflowing the ~16 MB VMEM in the
    # wide-band/arrow regime; band_arrow.make_engine now streams those
    # through the chunked kernels, and BandedBackend reports
    # supports_fused_full_nd from its engine type (fast/banded.py).
    full_ok = getattr(backend, "supports_fused_full_nd", False)
    if fused_nd and s <= 3 and (
            full_ok or jax.default_backend() == "cpu"):
        # the ENTIRE s>1 fit (opt + on-device adaptation + main and
        # marginal grids + optional draws) as ONE dispatch. Returns
        # None when the on-device pipeline produced non-finite outputs
        # (optimization that ended inside the weak-theta sick region) —
        # fall through to the 3-dispatch flow, whose host-side
        # restart/PD-clip logic recovers.
        fit_1 = _aghq_fit_full_nd(backend, s, k, theta0, sample)
        if fit_1 is not None:
            if np.all(np.isfinite(fit_1.mode)):
                backend._warm_theta0_nd = np.asarray(fit_1.mode,
                                                     np.float64)
            return fit_1
    if fused_nd:
        # fused outer optimization: BFGS + FD Hessian in one dispatch
        if not hasattr(backend, "_fused_opt_nd"):
            backend._fused_opt_nd = _lifted_jit(
                backend, lambda be: build_fused_opt_nd(be, s, jit=False),
                prog_key=("optnd", s,
                          getattr(backend, "opt_nd_max_iter",
                                  _OPT_ND_MAX_ITER)))
        th0 = (jnp.zeros((s,), backend.dtype) if theta0 is None
               else jnp.asarray(np.atleast_1d(theta0), backend.dtype))
        mode_d, H_d, warm, st_d = backend._fused_opt_nd(
            th0, backend.init_state())
        mode, H, ostats = jax.device_get((mode_d, H_d, st_d))
        mode, H = np.asarray(mode), np.asarray(H)
        # segment/restart loop: ONE dispatch is bounded at
        # _OPT_ND_MAX_ITER BFGS iterations (a long dispatch trips the
        # tunnel's RPC deadline and kills the worker — round 14); a
        # sick cold start needs several segments to escape the
        # weak-theta noise pit (measured: ~60-110 evals on the s=3
        # two-smooth model), each re-dispatch of the SAME compiled
        # program costing ~30 ms. Healthy fits converge inside the
        # first segment and never loop.
        for _ in range(6):
            exhausted = float(ostats[0]) >= getattr(
                backend, "opt_nd_max_iter", _OPT_ND_MAX_ITER) - 0.5
            okH = np.all(np.isfinite(mode)) and np.all(np.isfinite(H))
            if okH and not exhausted:
                try:
                    np.linalg.cholesky(
                        np.linalg.inv(0.5 * (H + H.T)
                                      + 1e-12 * np.eye(s)))
                except np.linalg.LinAlgError:
                    okH = False
            if okH and not exhausted:
                break
            th_r = (mode if np.all(np.isfinite(mode))
                    else np.zeros(s))
            prev = mode
            mode_d, H_d, warm, st_d = backend._fused_opt_nd(
                jnp.asarray(th_r, backend.dtype), warm)
            mode, H, ostats = jax.device_get((mode_d, H_d, st_d))
            mode, H = np.asarray(mode), np.asarray(H)
            if (not exhausted and np.all(np.isfinite(mode))
                    and np.all(np.isfinite(prev))
                    and np.max(np.abs(mode - prev)) < 0.05):
                # no progress: a flat/near-singular outer Hessian at a
                # genuinely converged mode — the PD-clip downstream
                # handles the adaptation; more restarts just burn time
                break
    else:
        mode, H, _, warm = optimize_theta(backend, s, theta0=theta0,
                                          verbose=verbose)

    cov = np.linalg.inv(H)
    cov = 0.5 * (cov + cov.T)
    try:
        L = np.linalg.cholesky(cov)
    except np.linalg.LinAlgError:
        # fp-noisy outer Hessian (float32 paths): clip to PD — the
        # adaptation only places nodes, AGHQ stays correct regardless
        evals, evecs = np.linalg.eigh(cov)
        evals = np.clip(np.abs(evals), 1e-8 * max(np.abs(evals).max(), 1e-8),
                        None)
        cov = (evecs * evals) @ evecs.T
        L = np.linalg.cholesky(cov)

    z, logw_base = product_grid(k, s)
    nodes = mode[None, :] + z @ L.T
    logw = logw_base + np.log(np.diag(L)).sum()

    nodes_j = jnp.asarray(nodes, backend.dtype)
    presampled = None
    fuse_sample = (fused_nd and sample is not None
                   and hasattr(backend, "sample_traceable"))
    if fuse_sample:
        # node evaluations + posterior draws in one dispatch
        M_s = int(sample[1])
        nlls, states, idx_d, samps_d = _fused_nodes_cached(
            backend, z, True, sample_M=M_s)(
                nodes_j, warm, jnp.asarray(logw, backend.dtype),
                sample[0])
        nlls, idx_d, samps_d = jax.device_get((nlls, idx_d, samps_d))
        presampled = (np.asarray(samps_d, np.float64).T,
                      np.asarray(idx_d), np.asarray(sample[0]))
    elif fused_nd:
        # all k^s warm-chained node evaluations in one dispatch
        nlls, states = _fused_nodes_cached(backend, z, True)(nodes_j, warm)
    else:
        nlls, states = backend.node_eval(nodes_j, warm=warm)
    nlls = np.asarray(nlls)

    logpost_w = -nlls + logw
    lognormconst = _logsumexp_np(logpost_w)

    fit = AGHQFit(mode=mode, hessian=H, L=L, nodes=nodes, logw=logw,
                  lognll=nlls, lognormconst=lognormconst,
                  states=states, k=k, backend=backend,
                  presampled=presampled)
    if np.all(np.isfinite(mode)):
        backend._warm_theta0_nd = np.asarray(mode, np.float64)
    if fused_nd:
        # all s marginal grids in one dispatch (vs one per marginal)
        fit.marginals = _marginals_fused(fit, backend, warm)
    else:
        fit.marginals = [marginal_posterior(fit, backend, j, warm=warm)
                         for j in range(s)]
    return fit


def _aghq_fit_full_nd(backend, s: int, k: int, theta0, sample) -> AGHQFit:
    """aghq_fit via the single-dispatch s>1 program
    (build_fused_full_nd); host work is only the table arithmetic."""
    fuse_sample = (sample is not None
                   and hasattr(backend, "sample_traceable"))
    sample_M = int(sample[1]) if fuse_sample else 0
    cache = getattr(backend, "_fused_full_nd", None)
    if cache is None:
        cache = backend._fused_full_nd = {}
    ckey = (s, k, sample_M)
    if ckey not in cache:
        cache[ckey] = _lifted_jit(
            backend, lambda be: build_fused_full_nd(
                be, s, k, sample_M=sample_M, jit=False),
            prog_key=("fullnd",) + ckey + (
                getattr(backend, "opt_nd_max_iter",
                        _OPT_ND_MAX_ITER),))
    th0 = (jnp.zeros((s,), backend.dtype) if theta0 is None
           else jnp.asarray(np.atleast_1d(theta0), backend.dtype))
    args = (th0, backend.init_state())
    if sample_M:
        out = cache[ckey](*args, sample[0])
        (mode, H, L, nodes, nlls, states, marg_nlls, Lps, ostats,
         idx_d, samps_d) = out
        (mode, H, L, nodes, nlls, marg_nlls, Lps, ostats, idx_d,
         samps_d) = jax.device_get(
            (mode, H, L, nodes, nlls, marg_nlls, Lps, ostats, idx_d,
             samps_d))
        presampled = (np.asarray(samps_d, np.float64).T,
                      np.asarray(idx_d), np.asarray(sample[0]))
    else:
        out = cache[ckey](*args)
        (mode, H, L, nodes, nlls, states, marg_nlls, Lps,
         ostats) = out
        mode, H, L, nodes, nlls, marg_nlls, Lps, ostats = \
            jax.device_get(
                (mode, H, L, nodes, nlls, marg_nlls, Lps, ostats))
        presampled = None
    # the embedded optimizer exhausted its per-dispatch iteration
    # budget (sick cold start): fall back to the 3-dispatch flow whose
    # host loop SEGMENTS the optimization across dispatches
    if float(np.asarray(ostats)[0]) >= getattr(
            backend, "opt_nd_max_iter", _OPT_ND_MAX_ITER) - 0.5:
        return None
    mode = np.asarray(mode, np.float64)
    H = np.asarray(H, np.float64)
    L = np.asarray(L, np.float64)
    nlls = np.asarray(nlls, np.float64)
    if not (np.all(np.isfinite(mode)) and np.all(np.isfinite(H))
            and np.all(np.isfinite(L)) and np.all(np.isfinite(nlls))):
        return None          # sick-start run — caller falls back
    z, logw_base = product_grid(k, s)
    logw = logw_base + np.log(np.diag(L)).sum()
    lognormconst = _logsumexp_np(-nlls + logw)
    fit = AGHQFit(mode=mode, hessian=H, L=L,
                  nodes=np.asarray(nodes, np.float64), logw=logw,
                  lognll=nlls, lognormconst=lognormconst,
                  states=states, k=k, backend=backend,
                  presampled=presampled)
    marg_nlls = np.asarray(marg_nlls, np.float64)
    Lps = np.asarray(Lps, np.float64)
    fit.marginals = []
    for j in range(s):
        pj = np.array([j] + [i for i in range(s) if i != j])
        fit.marginals.append(
            _marginal_table(fit, marg_nlls[j], mode[pj], Lps[j]))
    return fit


def marginal_posterior(fit: AGHQFit, backend, j: int, warm=None):
    """AGHQ marginal of theta_j: re-adapt with dim j ordered first so its
    node values collapse to k unique points, then integrate the remaining
    dims by the adapted quadrature (mirrors aghq::marginal_posterior).

    Returns dict(theta=(k,), logmargpost=(k,)) sorted by theta.
    """
    s = len(fit.mode)
    k = fit.k
    if s == 1:
        order = np.argsort(fit.nodes[:, 0])
        return {"theta": fit.nodes[order, 0],
                "logmargpost": (-fit.lognll - fit.lognormconst)[order]}

    nodes_orig, mode_p, Lp = _marginal_nodes(fit, j)
    nodes_dev = jnp.asarray(nodes_orig, backend.dtype)
    if (warm is not None
            and getattr(backend, "prefer_host_opt", False)
            and hasattr(backend, "node_eval")):
        # heavy-per-eval backends: per-node dispatches (a J-node fused
        # dispatch is the long-dispatch worker-kill class)
        nlls = np.asarray(backend.node_eval(nodes_dev, warm=warm)[0])
    elif warm is not None and getattr(backend, "supports_fused_nd", False):
        # single-dispatch stateless node evals (same J as the main grid,
        # so the compiled program is reused across the s marginals)
        z, _ = product_grid(k, s)
        nlls = np.asarray(
            _fused_nodes_cached(backend, z, False)(nodes_dev, warm))
    elif warm is not None and hasattr(backend, "vmap_nll_warm_fn"):
        nlls = np.asarray(backend.vmap_nll_warm_fn()(nodes_dev, warm))
    else:
        nlls = np.asarray(backend.vmap_nll_fn()(nodes_dev))
    return _marginal_table(fit, nlls, mode_p, Lp)


def _marginal_nodes(fit: AGHQFit, j: int):
    """Re-adapted node grid for the marginal of theta_j: dim j ordered
    first so its node values collapse to k unique points. Returns
    (nodes in ORIGINAL theta ordering (J, s), permuted mode, permuted
    Cholesky factor Lp)."""
    s, k = len(fit.mode), fit.k
    idx = [j] + [i for i in range(s) if i != j]
    # adapted covariance from the fit's (PD-clipped) Cholesky factor, NOT
    # a fresh inv(hessian): fp-noisy FD Hessians (fused f32 paths) can be
    # indefinite, and a principal permutation of L L^T stays PD
    cov = fit.L @ fit.L.T
    cov_p = cov[np.ix_(idx, idx)]
    Lp = np.linalg.cholesky(cov_p)
    mode_p = fit.mode[idx]
    z, _ = product_grid(k, s)
    nodes_p = mode_p[None, :] + z @ Lp.T     # dim 0 is theta_j
    # invert permutation to evaluate nll with original ordering
    return nodes_p[:, np.argsort(idx)], mode_p, Lp


def _marginal_table(fit: AGHQFit, nlls: np.ndarray, mode_p, Lp):
    """logmargpost of theta_j from its re-adapted grid's nll values
    (the quadrature over the remaining s-1 dims)."""
    s, k = len(fit.mode), fit.k
    _, logw_base = product_grid(k, s)
    z1, w1 = ghe_rule(k)
    # group nodes by leading z value: product() ordering has the first dim
    # slowest-varying in blocks of k^(s-1)
    block = k ** (s - 1)
    theta_vals = mode_p[0] + Lp[0, 0] * z1
    logpdf = np.empty(k)
    logw_other = logw_base.reshape(k, block) - np.log(w1)[:, None]
    det_other = np.sum(np.log(np.diag(Lp)[1:]))
    for i in range(k):
        vals = -nlls.reshape(k, block)[i] + logw_other[i] + det_other
        logpdf[i] = _logsumexp_np(vals) - fit.lognormconst
    order = np.argsort(theta_vals)
    return {"theta": theta_vals[order], "logmargpost": logpdf[order]}


def _marginals_fused(fit: AGHQFit, backend, warm):
    """All s marginal posteriors in ONE device dispatch: the s
    re-adapted k^s-node grids (_marginal_nodes) concatenate into a
    single (s*J, s) warm-chained fused-nodes scan — s dispatches of
    ~30 ms tunnel overhead each (BENCH_NOTES.md) become one. Each
    grid's block keeps its own nearest-neighbor tour (offset into the
    combined array); the one cross-block warm start is between nodes
    of adjacent grids, all within ~2 sd of the mode, so it costs a few
    extra inner-Newton iterations once per boundary. Values match the
    per-j path (marginal_posterior) to inner-Newton tolerance."""
    s, k = len(fit.mode), fit.k
    z, _ = product_grid(k, s)
    J = len(z)
    per_j = [_marginal_nodes(fit, j) for j in range(s)]
    nodes_comb = np.concatenate([p[0] for p in per_j])
    t1 = _node_tour(z)
    tour = np.concatenate([t1 + j * J for j in range(s)])
    prog = _fused_nodes_cached(backend, z, False, tour=tour,
                               key_tag="marg")
    nlls_comb = np.asarray(prog(jnp.asarray(nodes_comb, backend.dtype), warm))
    return [_marginal_table(fit, nlls_comb[j * J:(j + 1) * J],
                            per_j[j][1], per_j[j][2]) for j in range(s)]


def compute_moment(fit: AGHQFit, fn: Callable = None):
    """E[fn(theta)] under the AGHQ posterior (aghq::compute_moment)."""
    if fn is None:
        fn = lambda x: x
    vals = np.array([fn(th) for th in fit.nodes])
    w = np.exp(fit.logpost_nodes + fit.logw)
    return (vals * w[:, None] if vals.ndim > 1 else vals * w).sum(axis=0)


def interpolate_log_marginal(marg, method: str = "spline"):
    """Interpolant of logmargpost on the log scale.

    aghq uses R's natural cubic spline (splinefun method='natural'),
    which extrapolates LINEARLY beyond the data range — verified against
    the reference's covid README quantiles (-3.87922 / -3.268308 /
    -2.760093 reproduce to the fine-grid resolution only with
    natural + linear tails)."""
    from scipy.interpolate import CubicSpline
    theta, lp = marg["theta"], marg["logmargpost"]
    if len(theta) < 3 or method == "polynomial":
        coef = np.polyfit(theta, lp, deg=len(theta) - 1)
        return lambda x: np.polyval(coef, x)
    cs = CubicSpline(theta, lp, bc_type="natural", extrapolate=True)
    dleft = float(cs.derivative()(theta[0]))
    dright = float(cs.derivative()(theta[-1]))

    def interp(x):
        x = np.asarray(x, np.float64)
        y = cs(x)
        y = np.where(x < theta[0], lp[0] + dleft * (x - theta[0]), y)
        y = np.where(x > theta[-1], lp[-1] + dright * (x - theta[-1]), y)
        return y

    return interp


def compute_pdf_and_cdf(marg, transformation=None, finegrid=None):
    """Fine-grid pdf/cdf of one theta marginal, optionally transformed
    (mirrors aghq::compute_pdf_and_cdf: range extended by half-range on
    each side, 1000 points, cdf by left-Riemann cumsum)."""
    interp = interpolate_log_marginal(marg)
    theta = marg["theta"]
    if finegrid is None:
        rn = theta.max() - theta.min()
        finegrid = np.linspace(theta.min() - rn / 2, theta.max() + rn / 2, 1000)
    logpdf = interp(finegrid)
    pdf = np.exp(logpdf)
    cdf = np.cumsum(pdf * np.concatenate([[0.0], np.diff(finegrid)]))
    out = {"theta": finegrid, "pdf": pdf, "cdf": cdf}
    if transformation is not None:
        fromtheta = transformation["fromtheta"]
        totheta = transformation["totheta"]
        tp = fromtheta(finegrid)
        eps = 1e-6
        # |d theta / d transparam| evaluated at the transformed values
        dtheta = np.abs((totheta(tp + eps) - totheta(tp - eps)) / (2 * eps))
        out["transparam"] = tp
        out["pdf_transparam"] = pdf * dtheta
    return out


def compute_quantiles(marg, q=(0.025, 0.5, 0.975)):
    """Quantiles from the interpolated cdf (aghq::compute_quantiles)."""
    pc = compute_pdf_and_cdf(marg)
    grid, cdf = pc["theta"], pc["cdf"]
    out = []
    for p in q:
        below = np.where(cdf < p)[0]
        out.append(grid[below.max()] if len(below) else grid[0])
    return np.array(out)


def summarize_marginals(fit: AGHQFit):
    """Per-theta mean/sd/quantiles (aghq::summary.aghq moments table)."""
    rows = []
    mean = compute_moment(fit)
    second = compute_moment(fit, lambda th: th ** 2)
    sd = np.sqrt(np.maximum(second - mean ** 2, 0.0))
    for jdim, marg in enumerate(fit.marginals):
        qs = compute_quantiles(marg)
        rows.append({"mean": float(np.atleast_1d(mean)[jdim]),
                     "sd": float(np.atleast_1d(sd)[jdim]),
                     "q2.5": float(qs[0]), "median": float(qs[1]),
                     "q97.5": float(qs[2])})
    return rows
