"""Phase-level breakdown of the headline n=1e5/k=2000 AGHQ fit on the
real chip. Prints wall-clock per phase and call counts so optimization
effort goes where the time actually is.

Usage: python tools/profile_fit.py [n] [k]
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

sys.path.insert(0, "/root/repo")


def t(fn, *a, **k):
    t0 = time.time()
    out = fn(*a, **k)
    out = jax.block_until_ready(out) if hasattr(out, "block_until_ready") \
        else jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
            else x, out)
    return out, time.time() - t0


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 100_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    from bench import build_problem
    import jax.numpy as jnp

    t0 = time.time()
    backend = build_problem(n=n, k=k)
    print(f"build: {time.time()-t0:.2f}s  d={backend.d} q={backend.q} "
          f"s={backend.s} nb={backend.nb}")

    dt = backend.dtype
    th = jnp.zeros((1,), dt)
    init = backend.init_state()

    # individual pieces, compiled fresh
    vg = backend.val_grad_warm_fn()
    (v, warm), g = vg(th, init)
    jax.block_until_ready(warm)
    print("compiled val_grad_warm")

    (_, warm), _ = vg(th, init)
    jax.block_until_ready(warm)
    for label, wstate in (("cold", init), ("warm", warm)):
        t0 = time.time()
        (v2, w2), g2 = vg(th + 0.01, wstate)
        jax.block_until_ready(w2)
        print(f"val_grad_warm ({label} start): {time.time()-t0:.3f}s")

    # one newton step / hessian_factor / solve granularity
    one_step = jax.jit(lambda V, tl: backend.newton_step(V, tl, th))
    V0, t0s = warm
    out, dt_ = t(one_step, V0, t0s)
    out, dt_ = t(one_step, V0, t0s)
    print(f"newton_step: {dt_:.3f}s")

    hf = jax.jit(lambda V, tl: backend.hessian_factor(V, tl, th))
    f_, dt_ = t(hf, V0, t0s)
    f_, dt_ = t(hf, V0, t0s)
    print(f"hessian_factor: {dt_:.3f}s")

    gw = jax.jit(lambda V, tl: backend.grad_W(V, tl, th))
    _, dt_ = t(gw, V0, t0s)
    _, dt_ = t(gw, V0, t0s)
    print(f"grad_W: {dt_:.3f}s")

    nlp = jax.jit(lambda V, tl: backend.neg_log_post(V, tl, th))
    _, dt_ = t(nlp, V0, t0s)
    _, dt_ = t(nlp, V0, t0s)
    print(f"neg_log_post: {dt_:.3f}s")

    hw = backend.hess_warm_fn()
    _, dt_ = t(hw, th, warm)
    _, dt_ = t(hw, th, warm)
    print(f"hess_warm (FD, 2 grads): {dt_:.3f}s")

    # instrumented outer optimization
    from bayesgp_tpu.inference import aghq as am
    calls = {"vg": 0, "hess": 0}
    orig_vg, orig_h = backend.val_grad_warm_fn, backend.hess_warm_fn

    def count_vg():
        f = orig_vg()
        def wrapped(*a):
            calls["vg"] += 1
            return f(*a)
        return wrapped

    def count_h():
        f = orig_h()
        def wrapped(*a):
            calls["hess"] += 1
            return f(*a)
        return wrapped

    backend.val_grad_warm_fn = count_vg
    backend.hess_warm_fn = count_h
    t0 = time.time()
    mode, H, fval, state = am.optimize_theta(backend, 1, verbose=True)
    t_opt = time.time() - t0
    print(f"optimize_theta: {t_opt:.2f}s  vg_calls={calls['vg']} "
          f"hess_calls={calls['hess']} mode={mode}")
    backend.val_grad_warm_fn = orig_vg
    backend.hess_warm_fn = orig_h

    t0 = time.time()
    nlls, states = backend.node_eval(
        jnp.asarray(np.linspace(mode - 0.5, mode + 0.5, 4).reshape(4, 1), dt),
        warm=state)
    jax.block_until_ready(nlls)
    print(f"node_eval(4): {time.time()-t0:.2f}s")

    t0 = time.time()
    fit = am.aghq_fit(backend, k=4)
    print(f"full aghq_fit (steady): {time.time()-t0:.2f}s "
          f"lognormconst={fit.lognormconst:.4f}")


if __name__ == "__main__":
    main()
