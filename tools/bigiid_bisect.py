"""Bisect the bigiid (n=1e5, k=2000, q=1e4 x-clustered) scatter_iid
worker fault by pipeline stage, one stage per run (run each in its own
process — an in-process client of a crashed worker is unrecoverable).

  factor   hessian_factor + half_logdet + solve_H, one jitted call
  newton   solve_W_star (inner Newton while_loop)
  nll      nll_warm primal (Laplace value at theta0)
  grad     d nll / d theta (the custom-VJP bwd: AD through the dd
           dense factor's Murray pullback)
  optnd    one segment of the fused BFGS program
  fit      full aghq_fit (what bench_extra bigiid_scatter runs)

Usage: python tools/bigiid_bisect.py factor [newton ...]
       (each arg spawns a subprocess; no arg = all stages in order)
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STAGES = ["factor", "newton", "nll", "grad", "optnd", "fit"]


def build(n=100_000, k=2000, q=10_000):
    import numpy as np
    from bayesgp_tpu import terms as T
    from bayesgp_tpu.model import build as B
    from bayesgp_tpu.fast.scatter_iid import build_scatter_iid

    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0.0, 365.0, n))
    g = np.floor(x * (q / 365.0))
    g = np.minimum(g, q - 1)
    u_true = 0.15 * rng.normal(size=int(g.max()) + 1)
    f_true = 1.5 + 0.8 * np.sin(2 * np.pi * x / 90.0) + 0.002 * x
    y = rng.poisson(np.exp(f_true + u_true[g.astype(int)])).astype(float)
    iwp = T.build_iwp_term("x", x, order=3, k=k, materialize_B=False)
    iid = T.build_iid_term("g", g, materialize_B=False)
    dmf = [np.ones((n, 1))]
    md = B.build_model_data([iwp, iid], dmf, y, "Poisson",
                            dense_design=False)
    bf = np.full(1, 0.01)
    return build_scatter_iid([iwp, iid], md, dmf, bf, np.zeros(1))


def run_stage(stage):
    import numpy as np
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_include_full_tracebacks_in_locations", False)

    t0 = time.time()
    be = build()
    build_s = time.time() - t0
    th = jnp.zeros((be.n_theta,), be.dtype)
    V0, u0, t0_ = be.init_state()
    print(f"# built in {build_s:.1f}s  d={be.core.d} dpad={be.core.dpad}"
          f" qf={be.core.q} q_iid={be.q_iid}", flush=True)
    t0 = time.time()

    if stage == "factor":
        def f(V, u, tl, th):
            fac = be.hessian_factor(V, u, tl, th)
            hld = be.half_logdet_H(fac)
            z = be.solve_H(fac, V, u, tl)
            return hld, z[0]
        jf = jax.jit(f)
        hld, z = jf(V0, u0, t0_, th)
        chk = float(hld) + float(jnp.sum(z))
    elif stage == "newton":
        jf = jax.jit(lambda th: be.solve_W_star(th))
        out = jf(th)
        chk = float(sum(jnp.sum(o) for o in out))
    elif stage == "nll":
        jf = jax.jit(lambda th: be.nll_warm(th, be.init_state())[0])
        chk = float(jf(th))
    elif stage == "grad":
        jf = jax.jit(jax.grad(lambda th: be.nll_warm(
            th, be.init_state())[0]))
        chk = float(jnp.sum(jf(th)))
    elif stage == "optnd":
        from bayesgp_tpu.inference import aghq
        s = be.n_theta
        prog = aghq._lifted_jit(
            be, lambda b: aghq.build_fused_opt_nd(b, s, jit=False),
            prog_key=("optnd", s, aghq._OPT_ND_MAX_ITER))
        mode, H, warm, st = prog(th, be.init_state())
        chk = float(jnp.sum(mode)) + float(jnp.sum(H))
    elif stage == "fit":
        from bayesgp_tpu.inference.aghq import aghq_fit
        fit = aghq_fit(be, k=3)
        chk = float(fit.lognormconst)
    else:
        raise SystemExit(f"unknown stage {stage}")
    first = time.time() - t0
    # one steady rep where cheap
    print(json.dumps({"stage": stage, "ok": True,
                      "first_s": round(first, 1),
                      "check": chk}), flush=True)


def probe_ok(timeout=180):
    code = ("import jax, jax.numpy as jnp;"
            "print(float(jnp.arange(8.0).sum()))")
    try:
        p = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout)
        return p.returncode == 0 and b"28.0" in p.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    if "--one" in sys.argv:
        run_stage(os.environ["STAGE"])
        return
    stages = [a for a in sys.argv[1:] if not a.startswith("-")] or STAGES
    for st in stages:
        for attempt in range(8):
            if probe_ok():
                break
            print(f"# probe failed, retry {attempt}", flush=True)
            time.sleep(30 * (attempt + 1))
        else:
            print(json.dumps({"stage": st, "ok": False,
                              "error": "worker never recovered"}),
                  flush=True)
            continue
        env = dict(os.environ, STAGE=st)
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one"],
                capture_output=True, timeout=2700, env=env, cwd=REPO)
            txt = (p.stdout or b"").decode(errors="replace")
            for line in txt.splitlines():
                print(line, flush=True)
            if p.returncode != 0:
                print(json.dumps({
                    "stage": st, "ok": False, "rc": p.returncode,
                    "wall_s": round(time.time() - t0, 1),
                    "stderr_tail": (p.stderr or b"")[-1500:].decode(
                        errors="replace")}), flush=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({"stage": st, "ok": False,
                              "error": "timeout 2700s"}), flush=True)


if __name__ == "__main__":
    main()
