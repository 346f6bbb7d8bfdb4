"""Bisect the two_smooths s=3 on-chip worker crash (round-13/14).

The model: n=2e4 Gaussian, IWP2 k=100 + sGP k=100 -> BandedBackend with
sGP DRIVER (d=297, Wl=12) and the IWP in the dense tail (q=103).
Engine-level ops at much larger shapes pass on-chip
(tools/chunked_onchip_check.py), so the fault is program-level. Run
each stage separately (each under the worker guard):

  1 engine  factor + half_logdet + solve, one jitted call
  2 laplace one warm Laplace eval (newton while_loop + factor)
  3 optnd   the fused BFGS optimizer program
  4 fit     full aghq_fit (3-dispatch path)
  5 full    single-dispatch fused s>1 program

Usage: python tools/two_smooths_bisect.py 1 [2 3 ...]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_include_full_tracebacks_in_locations", False)


def build(n=20000, k=100):
    from bayesgp_tpu.api import assemble_model
    from bayesgp_tpu.fast.banded import build_banded_backend
    rng = np.random.default_rng(1)
    x = np.sort(rng.uniform(0.0, 100.0, n))
    season = 0.6 * np.sin(2 * np.pi * x / 10.0)
    trend = 0.02 * x + 0.4 * np.sin(x / 15.0)
    y = trend + season + 0.3 * rng.normal(size=n)
    data = {"x": x, "xs": x.copy(), "y": y}
    fml = ("y ~ f(x=x, model='IWP', order=2, k=k_iwp) "
           "+ f(x=xs, model='sGP', period=10, k=k_sgp)")
    asm = assemble_model(formula=fml, data=data, family="Gaussian",
                         env={"k_iwp": k, "k_sgp": k}, engine="auto",
                         method="aghq")
    be = build_banded_backend(asm["instances"], asm["md"],
                              asm["design_mat_fixed"], asm["bf_prec"],
                              asm["bf_mean"], dtype=np.float32)
    return be


def stage(name, fn):
    t0 = time.time()
    out = fn()
    out = jax.tree_util.tree_map(
        lambda a: np.asarray(a) if hasattr(a, "shape") else a, out)
    print(f"[{name}] OK {time.time() - t0:.1f} s :: "
          f"{jax.tree_util.tree_map(lambda a: getattr(a, 'shape', a), out)}"[:200],
          flush=True)
    return out


def main(stages):
    be = build()
    print(f"backend: d={be.d} dpad={be.dpad} Wl={be.Wl} q={be.q} "
          f"engine={type(be.engine).__name__} "
          f"chunk={getattr(be.engine, 'chunk', None)}", flush=True)
    th0 = jnp.zeros((3,), be.dtype)

    if "1" in stages:
        eng = be.engine
        rng = np.random.default_rng(0)
        band = np.zeros((be.Wl, be.dpad))
        band[0] = 1.0
        for o in range(1, be.Wl):
            band[o, :be.dpad - o] = 0.3 / (o + 1) * rng.uniform(
                -1, 1, be.dpad - o)
        C = 0.01 * rng.normal(size=(be.dpad, be.q))
        Hq = rng.normal(size=(be.q, be.q))
        Hd = 0.01 * (Hq @ Hq.T) + 2.0 * np.eye(be.q)

        def run1():
            f = eng.factor(jnp.asarray(band), jnp.asarray(C),
                           jnp.asarray(Hd))
            hld = eng.half_logdet(f)
            zb, zd = eng.solve(f, jnp.ones((be.dpad,)),
                               jnp.ones((be.q,)))
            return hld, zb[:3], zd[:3]
        stage("engine", jax.jit(run1))

    if "2" in stages:
        def run2():
            return be.laplace_eval_full(th0, be.init_state())[0]
        nll0 = stage("laplace", jax.jit(run2))
        print("  nll(0,0,0) =", float(nll0), flush=True)

        vg = be.val_grad_warm_fn()
        for th in ([0.0, 0.0, 0.0], [8.0, 8.0, 2.0],
                   [15.3, 11.1, 2.3]):
            (v, _), g = jax.device_get(
                vg(jnp.asarray(th, be.dtype), be.init_state()))
            print(f"  th={th} nll={float(np.asarray(v)):.4f} "
                  f"g={np.asarray(g)}", flush=True)

    if "3" in stages:
        from bayesgp_tpu.inference.aghq import build_fused_opt_nd, _lifted_jit
        prog = _lifted_jit(be, lambda b: build_fused_opt_nd(b, 3,
                                                            jit=False))
        out = stage("optnd", lambda: prog(th0, be.init_state())[:2])
        print("  stats", np.asarray(stage(
            "optstats", lambda: prog(th0, be.init_state())[3])),
            flush=True)

    if "4a" in stages or "4b" in stages:
        from bayesgp_tpu.inference.aghq import (_fused_nodes_cached,
                                                product_grid)
        z, _ = product_grid(3, 3)
        J = 2 if "4a" in stages else len(z)
        zj = z[:J]
        prog = _fused_nodes_cached(be, zj, True)
        # mode-ish center, identity chol -> nodes near theta ~ 8
        nodes = jnp.asarray(8.0 + 0.3 * zj, be.dtype)
        stage(f"nodes_J{J}",
              lambda: prog(nodes, be.init_state())[0])

    if "4c" in stages or "4d" in stages:
        from bayesgp_tpu.inference import aghq as Ag
        prog = Ag._lifted_jit(
            be, lambda b: Ag.build_fused_opt_nd(b, 3, jit=False))
        mode_d, H_d, warm, _st = prog(th0, be.init_state())
        mode, H = jax.device_get((mode_d, H_d))
        print("[optnd] mode", np.asarray(mode), flush=True)
        cov = np.linalg.inv(np.asarray(H, np.float64))
        cov = 0.5 * (cov + cov.T)
        L = np.linalg.cholesky(cov)
        z, logw_base = Ag.product_grid(3, 3)
        nodes = np.asarray(mode, np.float64)[None, :] + z @ L.T
        prog2 = Ag._fused_nodes_cached(be, z, True)
        out = stage("nodes_after_opt",
                    lambda: prog2(jnp.asarray(nodes, be.dtype), warm)[0])
        if "4d" in stages:
            logw = logw_base + np.log(np.diag(L)).sum()
            nlls = np.asarray(out, np.float64)
            fit = Ag.AGHQFit(
                mode=np.asarray(mode, np.float64), hessian=np.asarray(
                    H, np.float64), L=L, nodes=nodes, logw=logw,
                lognll=nlls, lognormconst=Ag._logsumexp_np(-nlls + logw),
                states=prog2(jnp.asarray(nodes, be.dtype), warm)[1],
                k=3, backend=be)
            stage("marginals",
                  lambda: [np.asarray(m["logmargpost"]) for m in
                           Ag._marginals_fused(fit, be, warm)])

    if "4" in stages:
        from bayesgp_tpu.inference.aghq import aghq_fit
        stage("fit3disp", lambda: aghq_fit(be, k=3).mode)

    if "5" in stages:
        from bayesgp_tpu.inference.aghq import _aghq_fit_full_nd
        stage("fullnd", lambda: _aghq_fit_full_nd(be, 3, 3, None,
                                                  None).mode)


if __name__ == "__main__":
    main(sys.argv[1:] or ["1", "2", "3", "4", "5"])
