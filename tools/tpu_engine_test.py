"""On-chip validation + timing of the Pallas band engine at bench shapes
(d=2048, bw=3, q=3): correctness vs CPU-computed references, and
per-op latency vs the old block-tridiagonal f64 path."""
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

from bayesgp_tpu.linalg import band_arrow as ba


def bench(label, fn, *args, reps=10):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready()
                           if hasattr(x, "block_until_ready") else x, out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready()
                               if hasattr(x, "block_until_ready") else x, out)
    dt = (time.time() - t0) / reps
    print(f"{label:44s} {dt*1e3:9.2f} ms", flush=True)
    return out


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    d, bw, q, s = 2048, 3, 3, 128
    L0 = 0.4 * np.tril(rng.normal(size=(d, d)), -1)
    L0 *= np.abs(np.arange(d)[:, None] - np.arange(d)[None, :]) <= bw
    np.fill_diagonal(L0, 1.5 + rng.uniform(0, 1, d))
    A = L0 @ L0.T
    sdg = 1 / np.sqrt(np.diag(A))
    A = A * sdg[:, None] * sdg[None, :]
    band = np.zeros((bw + 1, d))
    for o in range(bw + 1):
        band[o, :d - o] = np.diag(A, -o)
    C = 0.1 * rng.normal(size=(d, q))
    Hq = rng.normal(size=(q, q))
    Hd = Hq @ Hq.T + np.eye(q) + C.T @ np.linalg.solve(A, C)
    Hfull = np.zeros((d + q, d + q))
    Hfull[:d, :d] = A
    Hfull[:d, d:] = C
    Hfull[d:, :d] = C.T
    Hfull[d:, d:] = Hd
    hld_ref = 0.5 * np.linalg.slogdet(Hfull)[1]
    rb, rd = rng.normal(size=d), rng.normal(size=q)
    zref = np.linalg.solve(Hfull, np.concatenate([rb, rd]))

    eng = ba.make_engine(d, bw, q, s, force="pallas")
    engb = ba.make_engine(d, bw, q, s, force="block")
    args = (jnp.asarray(band), jnp.asarray(C), jnp.asarray(Hd))

    fac = jax.jit(eng.factor)
    print("compiling factor...", flush=True)
    t0 = time.time()
    f = fac(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), f)
    print(f"factor compile+run: {time.time()-t0:.1f}s", flush=True)
    hld = jax.jit(eng.half_logdet)(f)
    print("hld err:", float(hld) - hld_ref, flush=True)
    zb, zd = jax.jit(eng.solve)(f, jnp.asarray(rb), jnp.asarray(rd))
    print("solve err:", np.abs(np.asarray(zb) - zref[:d]).max(),
          np.abs(np.asarray(zd) - zref[d:]).max(), flush=True)

    g = jax.jit(jax.grad(lambda *a: eng.arrow_half_logdet(*a),
                         argnums=(0, 1, 2)))(*args)
    Hinv = np.linalg.inv(Hfull)
    gb_ref = np.zeros_like(band)
    for o in range(bw + 1):
        gb_ref[o, :d - o] = np.diag(Hinv[:d, :d], -o) * (0.5 if o == 0 else 1)
    print("grad band err:", np.abs(np.asarray(g[0]) - gb_ref).max(),
          "C:", np.abs(np.asarray(g[1]) - Hinv[:d, d:]).max(),
          "Hd:", np.abs(np.asarray(g[2]) - 0.5 * Hinv[d:, d:]).max(),
          flush=True)

    M = 3072
    zbn = jnp.asarray(rng.normal(size=(d, M)))
    zdn = jnp.asarray(rng.normal(size=(q, M)))
    sm = jax.jit(eng.sample_multi)

    bench("pallas factor", fac, *args)
    bench("pallas solve", jax.jit(eng.solve), f, jnp.asarray(rb),
          jnp.asarray(rd))
    bench("pallas grad hld (takahashi)", jax.jit(jax.grad(
        lambda *a: eng.arrow_half_logdet(*a), argnums=(0, 1, 2))), *args)
    bench("pallas sample_multi M=3072", sm, f, zbn, zdn)

    print("--- old block-tridiag f64 path ---", flush=True)
    facb = jax.jit(engb.factor)
    t0 = time.time()
    fb = facb(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), fb)
    print(f"block factor compile+run: {time.time()-t0:.1f}s", flush=True)
    bench("block factor", facb, *args, reps=3)
    bench("block solve", jax.jit(engb.solve), fb, jnp.asarray(rb),
          jnp.asarray(rd), reps=3)


if __name__ == "__main__":
    main()
