"""Micro-benchmarks of the factorization-path pieces on the real chip:
where does hessian_factor/newton_step time actually go?"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
sys.path.insert(0, "/root/repo")


def bench(label, fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))         # compile
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    dt = (time.time() - t0) / reps
    print(f"{label:42s} {dt*1e3:9.2f} ms")
    return out


def main():
    from bayesgp_tpu.linalg import block_tridiag as btl

    nb, s, q = 16, 128, 4
    rng = np.random.default_rng(0)
    # SPD block-tridiagonal test matrix
    D = np.stack([np.eye(s) * (2.0 + i) + 0.01 * rng.normal(size=(s, s))
                  for i in range(nb)])
    D = 0.5 * (D + D.transpose(0, 2, 1)) + 4 * np.eye(s)
    E = 0.1 * rng.normal(size=(nb - 1, s, s))
    C = rng.normal(size=(nb, s, q))
    Hd = np.eye(q) * 10.0
    b = rng.normal(size=(nb, s))
    M = 3000
    Z = rng.normal(size=(nb, s, M))

    for dt_name, dt in (("f64", jnp.float64), ("f32", jnp.float32)):
        Dj, Ej = jnp.asarray(D, dt), jnp.asarray(E, dt)
        Cj, Hdj = jnp.asarray(C, dt), jnp.asarray(Hd, dt)
        bj = jnp.asarray(b, dt)
        Zj = jnp.asarray(Z, dt)

        chol = jax.jit(btl.bt_cholesky)
        fac = bench(f"[{dt_name}] bt_cholesky (16x128x128)", chol, Dj, Ej)

        af_fn = jax.jit(btl.arrow_factor)
        af = bench(f"[{dt_name}] arrow_factor (q=4)", af_fn, Dj, Ej, Cj, Hdj)

        solve = jax.jit(btl.arrow_solve)
        bench(f"[{dt_name}] arrow_solve (1 rhs)", solve, af, bj,
              jnp.zeros((q,), dt))

        ld = jax.jit(btl.arrow_half_logdet)
        bench(f"[{dt_name}] arrow_half_logdet", ld, af)

        multi = jax.jit(btl.arrow_sample_multi)
        bench(f"[{dt_name}] arrow_sample_multi (M=3000)", multi, af, Zj,
              jnp.zeros((q, M), dt), reps=2)

        # single-block primitives
        A1 = jnp.asarray(D[0], dt)
        L1 = jnp.linalg.cholesky(A1)
        bench(f"[{dt_name}] jnp chol 128x128", jax.jit(jnp.linalg.cholesky), A1)
        from jax.scipy.linalg import solve_triangular
        bench(f"[{dt_name}] trsm 128x128 (1 rhs)",
              jax.jit(lambda L, x: solve_triangular(L, x, lower=True)),
              L1, jnp.asarray(b[0], dt))
        bench(f"[{dt_name}] matmul 128x128",
              jax.jit(jnp.matmul), L1, A1)

    # the full hessian_factor from the bench problem (if cache warm)
    from bench import build_problem
    backend = build_problem(n=100_000, k=2000)
    th = jnp.zeros((1,), backend.dtype)
    V0, t0_ = backend.init_state()
    hf = jax.jit(lambda V, tl: backend.hessian_factor(V, tl, th))
    bench("hessian_factor (full, n=1e5 k=2000)", hf, V0, t0_)
    gw = jax.jit(lambda V, tl: backend.grad_W(V, tl, th))
    bench("grad_W", gw, V0, t0_)
    ns = jax.jit(lambda V, tl: backend.newton_step(V, tl, th))
    bench("newton_step", ns, V0, t0_)

    e_fn = jax.jit(lambda V, tl: backend.eta(V, tl))
    bench("eta", e_fn, V0, t0_)
    from bayesgp_tpu.model import families
    e = e_fn(V0, t0_)
    wt_fn = jax.jit(lambda e: families.eta_weights(
        e, backend.md, th.astype(backend.compute_dtype)))
    wts = bench("eta_weights", wt_fn, e)
    bh = jax.jit(lambda w: backend.band_H(w, th))
    band = bench("band_H (assembly)", bh, wts)
    cb = jax.jit(lambda w: backend.C_block(w, th))
    bench("C_block", cb, wts)
    b2b = jax.jit(lambda bd: btl.band_to_blocks(bd, backend.s))
    bench("band_to_blocks", b2b, band)


if __name__ == "__main__":
    main()
