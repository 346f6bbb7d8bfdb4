"""Minimal-repro ladder for the v5-lite worker-crash class (VERDICT r4 #1).

Three recorded crashes (two_smooths s=3 fused program, bigiid merged
band, scatter_iid dense (d+qf)=2009 f64 Schur factor) are hypothesised
to be ONE class: large f64 dense/wide-band factorization programs. This
ladder bisects crash vs {op, size, dtype} with STANDALONE one-op
programs, each in its own subprocess (an in-process client of a crashed
worker is unrecoverable — CLAUDE.md round-13 landmine), with a
fresh-process probe between rungs.

Rungs (key = op_size):
  f64chol_{512,1024,2048}    jnp.linalg.cholesky, f64 SPD
  f64blockchol_2048          linalg.chol_kernels.cholesky_blocked (f64
                             matmul formulation)
  f32chol_2048               same matrix in f32
  f64matmul_2048             plain (d,d) @ (d,d) f64
  f64trsm_{1024,2048}        solve_triangular f64, (d,d) rhs
  f64solve_chol_2048         cholesky + both triangular solves (the
                             scatter_iid composition)
  ddchol_2048                linalg.chol_dd double-float dense factor
                             (only if implemented)

Run all:    python tools/crash_ladder.py
Run rungs:  python tools/crash_ladder.py f64chol_2048 f64matmul_2048
One rung in-process (used by the driver): RUNG=<key> python tools/crash_ladder.py --one
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RUNGS = [
    "f64matmul_2048",
    "f32chol_2048",
    "f64chol_512",
    "f64chol_1024",
    "f64chol_2048",
    "f64trsm_1024",
    "f64trsm_2048",
    "f64blockchol_2048",
    "f64solve_chol_2048",
    "ddchol_512",
    "ddchol_1024",
    "ddchol_2048",
    "ddsolve_2048",
]


def _spd(d, dtype):
    import numpy as np
    rng = np.random.default_rng(0)
    G = rng.normal(size=(d, d)).astype(np.float64) / np.sqrt(d)
    A = G @ G.T + np.eye(d) * 2.0
    return A.astype(dtype)


def run_rung(key):
    import numpy as np
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_include_full_tracebacks_in_locations", False)

    op, d = key.rsplit("_", 1)
    d = int(d)
    t0 = time.time()
    if op == "f64matmul":
        A = jnp.asarray(_spd(d, "float64"))
        f = jax.jit(lambda A: A @ A)
        out = f(A).block_until_ready()
        chk = float(jnp.sum(out))
    elif op in ("f64chol", "f32chol"):
        dt = "float64" if op == "f64chol" else "float32"
        A = jnp.asarray(_spd(d, dt))
        f = jax.jit(jnp.linalg.cholesky)
        out = f(A).block_until_ready()
        chk = float(jnp.sum(jnp.diagonal(out)))
    elif op == "f64trsm":
        from jax.scipy.linalg import solve_triangular
        import numpy as np
        A = _spd(d, "float64")
        L = np.linalg.cholesky(A)
        B = np.ones((d, d))
        f = jax.jit(lambda L, B: solve_triangular(L, B, lower=True))
        out = f(jnp.asarray(L), jnp.asarray(B)).block_until_ready()
        chk = float(jnp.sum(out))
    elif op == "f64blockchol":
        from bayesgp_tpu.linalg import chol_kernels as ck
        A = jnp.asarray(_spd(d, "float64"))
        f = jax.jit(ck.cholesky_blocked)
        out = f(A).block_until_ready()
        chk = float(jnp.sum(jnp.diagonal(out)))
    elif op == "f64solve_chol":
        from jax.scipy.linalg import solve_triangular
        A = jnp.asarray(_spd(d, "float64"))
        b = jnp.ones((d,))

        def comp(A, b):
            L = jnp.linalg.cholesky(A)
            y = solve_triangular(L, b[:, None], lower=True)
            x = solve_triangular(L, y, lower=True, trans=1)[:, 0]
            return (jnp.sum(jnp.log(jnp.diagonal(L))), x)
        f = jax.jit(comp)
        hld, x = f(A, b)
        chk = float(hld.block_until_ready()) + float(jnp.sum(x))
    elif op == "ddchol":
        from bayesgp_tpu.linalg import chol_dd
        A = jnp.asarray(_spd(d, "float64"))
        f = jax.jit(chol_dd.cholesky_dd_f64)
        out = f(A).block_until_ready()
        chk = float(jnp.sum(jnp.diagonal(out)))
    elif op == "ddsolve":
        from bayesgp_tpu.linalg import chol_dd
        import numpy as np
        A = _spd(d, "float64")
        Lh = np.linalg.cholesky(A)
        b = np.ones((d, 1))

        def comp(L, b):
            y = chol_dd.solve_lower_blocked(L, b)
            x = chol_dd.solve_lower_t_blocked(L, y)
            return x
        f = jax.jit(comp)
        A = jnp.asarray(Lh)
        bj = jnp.asarray(b)
        out = f(A, bj).block_until_ready()
        chk = float(jnp.sum(out))
        L, B_ = A, bj
    else:
        raise SystemExit(f"unknown rung {key}")
    t_first = time.time() - t0
    # steady timing (3 reps)
    t0 = time.time()
    for _ in range(3):
        if op == "f64trsm":
            f(jnp.asarray(L), jnp.asarray(B)).block_until_ready()
        elif op == "ddsolve":
            f(L, B_).block_until_ready()
        elif op == "f64solve_chol":
            r = f(A, b)
            r[0].block_until_ready()
        else:
            f(A).block_until_ready() if op != "f64matmul" else f(A).block_until_ready()
    t_steady = (time.time() - t0) / 3
    print(json.dumps({"rung": key, "ok": True, "first_s": round(t_first, 3),
                      "steady_s": round(t_steady, 4), "check": chk}),
          flush=True)


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
        run_rung(os.environ["RUNG"])
        return
    keys = [a for a in sys.argv[1:] if not a.startswith("-")] or RUNGS
    results = []
    for key in keys:
        for attempt in range(6):
            if probe_ok():
                break
            print(f"# probe failed, retry {attempt}", flush=True)
            time.sleep(30 * (attempt + 1))
        else:
            results.append({"rung": key, "ok": False,
                            "error": "worker never recovered; skipped"})
            print(json.dumps(results[-1]), flush=True)
            continue
        env = dict(os.environ, RUNG=key)
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one"],
                capture_output=True, timeout=1500, env=env, cwd=REPO)
            rc = p.returncode
            tail = (p.stderr or b"")[-600:].decode(errors="replace")
            for line in (p.stdout or b"").decode(errors="replace").splitlines():
                if line.startswith("{"):
                    print(line, flush=True)
                    results.append(json.loads(line))
                    break
            else:
                results.append({"rung": key, "ok": False, "rc": rc,
                                "wall_s": round(time.time() - t0, 1),
                                "stderr_tail": tail})
                print(json.dumps(results[-1]), flush=True)
        except subprocess.TimeoutExpired:
            results.append({"rung": key, "ok": False, "error": "timeout 1500s"})
            print(json.dumps(results[-1]), flush=True)
    with open("/tmp/crash_ladder.json", "w") as f:
        json.dump(results, f, indent=1)
    print("# wrote /tmp/crash_ladder.json", flush=True)


if __name__ == "__main__":
    main()
