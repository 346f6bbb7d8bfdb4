"""On-chip decomposition of the headline fused fit (n=1e5, k=2000
IWP3-Poisson): times each layer of one warm Laplace evaluation as its
own jitted program so the 0.3-0.4 s steady fit can be attributed to
{O(n) f32 data passes, band factorization, O(d) f64 glue, Newton
iteration count, dispatch overhead}.

Usage: python tools/profile_fit.py [n] [k]
Prints one JSON line per probe. Every probe repeats the call R times
after a warmup and reports the median wall time; `dispatch_floor_ms`
(a trivial jitted op) is the tunnel/dispatch overhead to subtract
mentally from everything else.
"""
import json
import sys
import time

import numpy as np
import jax

if "--cpu" in sys.argv:          # sanity runs on the CPU backend
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

sys.path.insert(0, "/root/repo")


def _median_ms(fn, R=20, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(R):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main(n=100_000, k=2000):
    from bench_extra import _build_iwp

    be = _build_iwp(n, k, "Poisson")
    th_mode = jnp.asarray([14.5], be.dtype)
    st0 = be.init_state()

    out = {}

    trivial = jax.jit(lambda x: x + 1.0)
    x1 = jnp.zeros((8,), jnp.float32)
    out["dispatch_floor_ms"] = _median_ms(lambda: trivial(x1))

    # warm state at the mode (converged)
    warm_eval = jax.jit(lambda th, st: be.laplace_eval_full(th, st))
    _, warm_st, _ = warm_eval(th_mode, st0)
    warm_st = jax.block_until_ready(warm_st)

    out["laplace_eval_full_warm_ms"] = _median_ms(
        lambda: warm_eval(th_mode, warm_st)[0])

    # nll_warm with gradient (the optimizer-loop unit)
    vg = jax.jit(lambda th, st: jax.value_and_grad(
        be.nll_warm, has_aux=True)(th, st))
    out["nll_warm_valgrad_ms"] = _median_ms(
        lambda: vg(th_mode, warm_st)[0][0])

    # inner Newton solve alone, from the warm state (counts iterations
    # implicitly: compare against one refine step below)
    ns = jax.jit(lambda th, st: be.newton_solve(th, warm=st))
    out["newton_solve_warm_ms"] = _median_ms(lambda: ns(th_mode, warm_st))

    # ONE refine step = eta + grad + factor + solve (a Newton iteration
    # without the line-search likelihood pass)
    rf = jax.jit(lambda th, st: be._refine(st[0], st[1], th))
    out["one_refine_step_ms"] = _median_ms(lambda: rf(th_mode, warm_st))

    # O(n) pieces
    V, tail = warm_st
    eta_fn = jax.jit(lambda V, t: be.eta(V, t))
    e0 = jax.block_until_ready(eta_fn(V, tail))
    out["eta_pass_ms"] = _median_ms(lambda: eta_fn(V, tail))

    from bayesgp_tpu.model import families
    ll_fn = jax.jit(lambda e, th: families.log_lik(
        e, be.md, th.astype(be.compute_dtype)))
    out["log_lik_pass_ms"] = _median_ms(lambda: ll_fn(e0, th_mode))

    gw = jax.jit(lambda V, t, th: be.grad_W(V, t, th))
    out["grad_W_pass_ms"] = _median_ms(lambda: gw(V, tail, th_mode))

    # Hessian factor: O(n) Gram segsum + double-float band factorization
    hf = jax.jit(lambda V, t, th: be.hessian_factor(V, t, th))
    fac = jax.block_until_ready(hf(V, tail, th_mode))
    out["hessian_factor_ms"] = _median_ms(lambda: hf(V, tail, th_mode))

    # band+arrow solve alone (given factor)
    gV, gt = jax.block_until_ready(gw(V, tail, th_mode))
    sh = jax.jit(lambda f, gV, gt: be.solve_H(f, gV, gt))
    out["solve_H_ms"] = _median_ms(lambda: sh(fac, gV, gt))

    # half log-det alone (given factor)
    hl = jax.jit(lambda f: be.half_logdet_H(f))
    out["half_logdet_ms"] = _median_ms(lambda: hl(fac))

    print(json.dumps({"probe": "fit_decomposition", "n": n, "k": k,
                      **{kk: round(vv, 3) for kk, vv in out.items()}}),
          flush=True)


if __name__ == "__main__":
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 100_000
    kk = int(float(sys.argv[2])) if len(sys.argv) > 2 else 2000
    main(n, kk)
