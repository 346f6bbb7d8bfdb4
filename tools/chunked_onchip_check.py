"""On-chip validation of the chunked (HBM-streaming) band kernels at
round-13 crash scale: d=16k band factor/solve/Takahashi, and a q=300
lane-tiled arrow tail — the shapes that faulted the v5-lite worker
with the whole-array kernels. Asserts f64-level parity against numpy
on a moderate-bandwidth system.

Usage: python tools/chunked_onchip_check.py [d] [bw] [q]
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

from bayesgp_tpu.linalg import band_arrow as ba   # noqa: E402
from bayesgp_tpu.linalg import band_kernels as bk  # noqa: E402


def spd_band(rng, d, bw):
    band = np.zeros((bw + 1, d))
    band[0] = 1.0
    for o in range(1, bw + 1):
        band[o, :d - o] = 0.3 / (o + 1) * rng.uniform(-1, 1, d - o)
    return band


def main(d=16000, bw=13, q=300):
    rng = np.random.default_rng(0)
    band = spd_band(rng, d, bw)
    C = 0.01 * rng.normal(size=(d, q))
    Hq = rng.normal(size=(q, q))
    Hd = 0.01 * (Hq @ Hq.T) + 2.0 * np.eye(q)

    eng = ba.make_engine(d, bw, q, bw + 3)
    print(f"engine: {type(eng).__name__} chunk={getattr(eng, 'chunk', None)} "
          f"R={getattr(eng, 'R', None)}", flush=True)

    args = (jnp.asarray(band), jnp.asarray(C), jnp.asarray(Hd))
    t0 = time.time()
    f = eng.factor(*args)
    hld = float(eng.half_logdet(f))
    print(f"factor+hld compile+run: {time.time() - t0:.1f} s "
          f"hld={hld:.6f}", flush=True)
    t0 = time.time()
    f = eng.factor(*args)
    hld = float(eng.half_logdet(f))
    print(f"factor+hld steady: {time.time() - t0:.3f} s", flush=True)

    rb = rng.normal(size=d)
    rd = rng.normal(size=q)
    t0 = time.time()
    zb, zd = eng.solve(f, jnp.asarray(rb), jnp.asarray(rd))
    zb, zd = np.asarray(zb), np.asarray(zd)
    print(f"solve: {time.time() - t0:.2f} s", flush=True)

    # numpy reference (banded dense is fine at d=16k? no — use scipy
    # banded cholesky instead of dense d x d)
    from scipy.linalg import cholesky_banded, cho_solve_banded
    ab = np.zeros((bw + 1, d))
    ab[-1] = band[0]
    for o in range(1, bw + 1):
        ab[-1 - o, o:] = band[o, :d - o]
    cb = cholesky_banded(ab, lower=False)
    hld_ref = np.sum(np.log(cb[-1]))
    Yref = np.column_stack([
        cho_solve_banded((cb, False), C[:, j]) for j in range(q)])
    S = Hd - C.T @ Yref
    sgn, ld_s = np.linalg.slogdet(S)
    hld_full = hld_ref + 0.5 * ld_s
    # on-chip envelope: band recurrence is dd (~1e-11); the Schur tail
    # rides split-f32 accumulated Grams (acc_dot_d, ~3e-8 absolute at
    # d=16k — the emulated f64 matmul itself is only ~4e-6)
    print(f"hld err: {abs(hld - hld_full):.3e}", flush=True)
    assert abs(hld - hld_full) < 3e-6 * max(1.0, abs(hld_full))

    # solve parity through the Schur construction
    u = cho_solve_banded((cb, False), rb)
    zd_ref = np.linalg.solve(S, rd - C.T @ u)
    zb_ref = cho_solve_banded((cb, False), rb - C @ zd_ref)
    print(f"zb err: {np.abs(zb - zb_ref).max():.3e}  "
          f"zd err: {np.abs(zd - zd_ref).max():.3e}", flush=True)
    assert np.abs(zb - zb_ref).max() < 2e-6
    assert np.abs(zd - zd_ref).max() < 5e-6

    # gradient path (Takahashi + tiled Wm)
    t0 = time.time()
    g = jax.grad(lambda b_, c_, h_: eng.arrow_half_logdet(b_, c_, h_),
                 argnums=(0, 1, 2))(*args)
    gb = np.asarray(g[0])
    print(f"grad compile+run: {time.time() - t0:.1f} s "
          f"|g_band|={np.abs(gb).max():.4f}", flush=True)
    assert np.all(np.isfinite(gb))

    # sampling
    M = 512
    zb_n = jnp.asarray(rng.normal(size=(d, M)), jnp.float32)
    zd_n = jnp.asarray(rng.normal(size=(q, M)), jnp.float32)
    t0 = time.time()
    xb, xd = eng.sample_multi(f, zb_n, zd_n)
    xb = np.asarray(xb)
    print(f"sample_multi: {time.time() - t0:.1f} s finite="
          f"{np.all(np.isfinite(xb))}", flush=True)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    a = [int(v) for v in sys.argv[1:]]
    main(*a)
