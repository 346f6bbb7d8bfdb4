"""Bisect where hessian_factor's unattributed ~155 ms goes: build the
same composition incrementally inside ONE jit each and time them."""
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
    out = jax.block_until_ready(jax.tree_util.tree_map(
        lambda x: x, fn(*args)))
    jax.tree_util.tree_map(lambda x: x.block_until_ready()
                           if hasattr(x, "block_until_ready") else x, out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready()
                               if hasattr(x, "block_until_ready") else x, out)
    dt = (time.time() - t0) / reps
    print(f"{label:52s} {dt*1e3:9.2f} ms", flush=True)


def main():
    from bench import build_problem
    from bayesgp_tpu.model import families
    from bayesgp_tpu.linalg import block_tridiag as btl

    be = build_problem(n=100_000, k=2000)
    th = jnp.zeros((1,), be.dtype)
    V0, t0_ = be.init_state()

    def stage_eta(V, tl):
        return be.eta(V, tl)

    def stage_wts(V, tl):
        e = be.eta(V, tl)
        return families.eta_weights(e, be.md, th.astype(be.compute_dtype))

    def stage_band(V, tl):
        w = stage_wts(V, tl)
        return be.band_H(w, th)

    def stage_band_C(V, tl):
        w = stage_wts(V, tl)
        return be.band_H(w, th), be.C_block(w, th)

    def stage_band_C_Hd(V, tl):
        w = stage_wts(V, tl)
        band = be.band_H(w, th)
        C = be.C_block(w, th)
        Hd = (be._gram64(be.XFpT * w[None, :], be.XFpT)
              + jnp.exp(th[0]) * be.Z0PZ0
              + jnp.diag(be.prior_diag_tail))
        return band, C, Hd

    def stage_equil(V, tl):
        band, C, Hd = stage_band_C_Hd(V, tl)
        sd = jax.lax.rsqrt(jnp.diagonal(Hd))
        Hd = Hd * sd[:, None] * sd[None, :]
        sc = jax.lax.rsqrt(band[0])
        band_s = band.at[0].multiply(sc * sc)
        for o in range(1, be.p + 1):
            band_s = band_s.at[o, :be.dpad - o].multiply(
                sc[o:] * sc[:be.dpad - o])
        C_s = C * sc[:, None] * sd[None, :]
        return band_s, C_s, Hd, sc, sd

    def stage_blocks(V, tl):
        band_s, C_s, Hd, sc, sd = stage_equil(V, tl)
        D, E = btl.band_to_blocks(band_s, be.s)
        return D, E, C_s, Hd, sc, sd

    def stage_full(V, tl):
        return be.hessian_factor(V, tl, th)

    for name, fn in [("eta", stage_eta), ("wts", stage_wts),
                     ("band", stage_band), ("band+C", stage_band_C),
                     ("band+C+Hd", stage_band_C_Hd),
                     ("..+equil", stage_equil),
                     ("..+band_to_blocks", stage_blocks),
                     ("full hessian_factor", stage_full)]:
        bench(name, jax.jit(fn), V0, t0_)

    # is it the (Wl,Wl,n) outer-product segsum that multiplies when
    # composed? time segsum pieces standalone-composed
    def seg_band_only(V, tl):
        w = stage_wts(V, tl)
        outersT = (w[None, None, :] * be.valsT[:, None, :]
                   * be.valsT[None, :, :])
        return be._segsum(outersT)

    bench("segsum((p+1)^2, n) alone", jax.jit(seg_band_only), V0, t0_)

    def seg_C_only(V, tl):
        w = stage_wts(V, tl)
        wXFT = w[None, :] * be.XFpT
        return be._segsum(be.valsT[:, None, :] * wXFT[None, :, :])

    bench("segsum C alone", jax.jit(seg_C_only), V0, t0_)

    def gram_only(V, tl):
        w = stage_wts(V, tl)
        return be._gram64(be.XFpT * w[None, :], be.XFpT)

    bench("gram64 alone", jax.jit(gram_only), V0, t0_)


if __name__ == "__main__":
    main()
