"""Test candidate fixes for the hessian_factor composition penalty:
A) optimization_barrier after the O(n) reductions,
B) ONE fused segsum pass for band/C/gram channels,
C) both.
"""
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
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready()
                           if hasattr(x, "block_until_ready") else x, out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready()
                               if hasattr(x, "block_until_ready") else x, out)
    dt = (time.time() - t0) / reps
    print(f"{label:52s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    from bench import build_problem
    from bayesgp_tpu.model import families
    from bayesgp_tpu.linalg import block_tridiag as btl

    be = build_problem(n=100_000, k=2000)
    th = jnp.zeros((1,), be.dtype)
    V0, t0_ = be.init_state()
    p = be.p

    def wts_of(V, tl):
        e = be.eta(V, tl)
        return families.eta_weights(e, be.md, th.astype(be.compute_dtype))

    # ---- A: barriers around the current structure ----
    def hf_barrier(V, tl):
        w = wts_of(V, tl)
        band = be.band_H(w, th)
        C = be.C_block(w, th)
        Hd = (be._gram64(be.XFpT * w[None, :], be.XFpT)
              + jnp.exp(th[0]) * be.Z0PZ0 + jnp.diag(be.prior_diag_tail))
        band, C, Hd = jax.lax.optimization_barrier((band, C, Hd))
        sd = jax.lax.rsqrt(jnp.diagonal(Hd))
        Hd = Hd * sd[:, None] * sd[None, :]
        sc = jax.lax.rsqrt(band[0])
        band_s = band.at[0].multiply(sc * sc)
        for o in range(1, p + 1):
            band_s = band_s.at[o, :be.dpad - o].multiply(
                sc[o:] * sc[:be.dpad - o])
        C_s = C * sc[:, None] * sd[None, :]
        band_s, C_s = jax.lax.optimization_barrier((band_s, C_s))
        D, E = btl.band_to_blocks(band_s, be.s)
        D, E = jax.lax.optimization_barrier((D, E))
        af = btl.arrow_factor(D, E, C_s.reshape(be.nb, be.s, be.q), Hd)
        return af, sc, sd

    # ---- B: one fused segsum over [vals | XFp] channel pairs ----
    q = be.q
    Wl = p + 1
    nch = Wl + q

    def hf_fused(V, tl):
        w = wts_of(V, tl)
        R = jnp.concatenate([be.valsT, be.XFpT], axis=0)      # (nch, n)
        outers = w[None, None, :] * R[:, None, :] * R[None, :, :]
        M = be._segsum(outers)                                # (nch, nch, d)
        # band part
        rows = []
        for o in range(Wl):
            row = jnp.zeros((be.dpad,), be.dtype)
            for b in range(Wl - o):
                a = b + o
                row = row + be._shift(M[a, b], b, be.dpad)
            rows.append(row)
        band = jnp.stack(rows)
        band = band.at[:, :be.d].add(jnp.exp(th[0]) * be.P_band)
        band = band.at[0, be.d:].set(1.0)
        # C part
        C = jnp.zeros((be.dpad, q), be.dtype)
        for a in range(Wl):
            C = C + be._shift(M[a, Wl:].T, a, be.dpad)
        C = C.at[:be.d].add(-jnp.exp(th[0]) * be.PZ0)
        # Hd part: total gram = sum over segments
        Hd = (jnp.sum(M[Wl:, Wl:], axis=-1)
              + jnp.exp(th[0]) * be.Z0PZ0 + jnp.diag(be.prior_diag_tail))
        band, C, Hd = jax.lax.optimization_barrier((band, C, Hd))
        sd = jax.lax.rsqrt(jnp.diagonal(Hd))
        Hd = Hd * sd[:, None] * sd[None, :]
        sc = jax.lax.rsqrt(band[0])
        band_s = band.at[0].multiply(sc * sc)
        for o in range(1, p + 1):
            band_s = band_s.at[o, :be.dpad - o].multiply(
                sc[o:] * sc[:be.dpad - o])
        C_s = C * sc[:, None] * sd[None, :]
        D, E = btl.band_to_blocks(band_s, be.s)
        af = btl.arrow_factor(D, E, C_s.reshape(be.nb, be.s, q), Hd)
        return af, sc, sd

    ref = bench("full hessian_factor (current)",
                jax.jit(lambda V, tl: be.hessian_factor(V, tl, th)), V0, t0_)
    outA = bench("A: barriers", jax.jit(hf_barrier), V0, t0_)
    outB = bench("B: fused segsum + barrier", jax.jit(hf_fused), V0, t0_)

    # numeric agreement
    for name, out in (("A", outA), ("B", outB)):
        for lref, lout in zip(jax.tree_util.tree_leaves(ref),
                              jax.tree_util.tree_leaves(out)):
            d = float(jnp.max(jnp.abs(lref - lout)))
            scale = float(jnp.max(jnp.abs(lref))) + 1e-30
            assert d <= 1e-6 * scale + 1e-9, (name, d, scale)
    print("numerics agree")

    # also: a newton_step built on the fused hf
    def newton_fused(V, tl):
        gV, gt = be.grad_W(V, tl, th)
        factor = hf_fused(V, tl)
        sV, st_ = be.solve_H(factor, gV, gt)
        return sV, st_

    bench("newton solve (fused hf + grad + solve)",
          jax.jit(newton_fused), V0, t0_)
    bench("newton_step (current)",
          jax.jit(lambda V, tl: be.newton_step(V, tl, th)), V0, t0_)


if __name__ == "__main__":
    main()
