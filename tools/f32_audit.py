"""Production-scale f32 correctness audit (VERDICT round-1 item 5).

One fit at a scale a CPU-f64 fit can still cross-check (n=2e4, k=500
IWP3 Poisson): the on-chip mixed-precision (f32 compute / f64 solve)
posterior vs the CPU full-f64 posterior of the SAME data. Reports the
user-facing error bars the f32 noise pit induces on:

  - theta mode / lognormconst
  - theta posterior mean / sd / quantiles (marginal table)
  - predict mean and 95% band (sup-norm over a 2000-point grid)

Methodology mirrors the reference's golden-number regression
(/root/reference/README.md:59-96): integrated posterior quantities are
the stable observables; optimizer-path scalars live in a noise basin
(PARITY.md).

Usage:
  python tools/f32_audit.py            # spawns the CPU-f64 half, then
                                       # runs the accelerator half and
                                       # prints one JSON line
  python tools/f32_audit.py --cpu OUT  # internal: CPU-f64 reference
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

N, K, SEED = 20_000, 500, 7
PRED_GRID = 2000


def _data():
    rng = np.random.default_rng(SEED)
    x = np.sort(rng.uniform(0.0, 365.0, N))
    f_true = 1.2 + 0.7 * np.sin(2 * np.pi * x / 80.0) + 0.001 * x
    y = rng.poisson(np.exp(f_true)).astype(np.float64)
    return x, y


def _fit(dtype):
    import jax
    from bayesgp_tpu import terms as T
    from bayesgp_tpu.model import build as B
    from bayesgp_tpu.fast.iwp import build_fast_iwp
    from bayesgp_tpu.inference.aghq import aghq_fit, summarize_marginals
    from bayesgp_tpu.inference import sampling as S
    from bayesgp_tpu import postfit

    x, y = _data()
    inst = T.build_iwp_term("x", x, order=3, k=K, materialize_B=False)
    dmf = [np.ones((N, 1))]
    md = B.build_model_data([inst], dmf, y, "Poisson", dense_design=False)
    xf = np.concatenate([inst.X] + dmf, axis=1)
    pt = np.full(xf.shape[1], 0.01)
    be = build_fast_iwp(inst, md, xf, pt, np.zeros_like(pt), inst.x_data,
                        dtype=dtype)
    t0 = time.time()
    fit = aghq_fit(be, k=4)
    first_s = time.time() - t0          # includes trace+lower+compile
    t0 = time.time()
    fit = aghq_fit(be, k=4)
    fit_s = time.time() - t0            # steady-state
    rows = summarize_marginals(fit)[0]

    # posterior function summaries on a fixed grid (M draws, fixed key)
    key = __import__("jax").random.PRNGKey(0)
    samps, _, _ = S.sample_marginal(key, fit, 2000)
    samps = np.asarray(samps, np.float64)
    d = inst.num_basis
    coefs = samps[:d, :]
    g = np.vstack([np.zeros((1, samps.shape[1])),
                   samps[d:d + inst.order - 1, :]])
    xs = np.linspace(0.0, 365.0, PRED_GRID)
    Bm = postfit.osplines.local_poly_helper(inst.knots, xs, p=inst.order)
    Xm = postfit.osplines.global_poly_helper(xs, p=inst.order)
    fdraws = Xm @ g + Bm @ coefs
    mean = fdraws.mean(axis=1)
    lo = np.quantile(fdraws, 0.025, axis=1)
    hi = np.quantile(fdraws, 0.975, axis=1)
    return {
        "mode": float(np.asarray(fit.mode).ravel()[0]),
        "lognormconst": float(fit.lognormconst),
        "theta_mean": rows["mean"], "theta_sd": rows["sd"],
        "theta_q25": rows["q2.5"], "theta_med": rows["median"],
        "theta_q975": rows["q97.5"],
        "pred_mean": mean, "pred_lo": lo, "pred_hi": hi,
        "fit_seconds": fit_s, "first_fit_seconds": first_s,
    }


def main_cpu(out_path):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    res = _fit(np.float64)
    np.savez(out_path, **res)
    print("cpu f64 reference written", flush=True)


def main_accel():
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_enable_x64", True)   # mixed-precision path
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_include_full_tracebacks_in_locations", False)

    ref_path = "/tmp/f32_audit_cpu.npz"
    if not os.path.exists(ref_path):
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--cpu", ref_path], capture_output=True,
                           timeout=3000)
        if r.returncode != 0:
            sys.stderr.write(r.stderr.decode()[-2000:])
            raise SystemExit("cpu reference failed")
    ref = dict(np.load(ref_path))

    res = _fit(np.float32)
    band = np.maximum(ref["pred_hi"] - ref["pred_lo"], 1e-12)
    out = {
        "metric": "f32_audit_n2e4_k500",
        "device": jax.devices()[0].device_kind,
        "fit_seconds": round(res["fit_seconds"], 3),
        "first_fit_seconds": round(float(res["first_fit_seconds"]), 3),
        "mode_diff": float(res["mode"] - ref["mode"]),
        "lognormconst_rel": float(
            (res["lognormconst"] - ref["lognormconst"])
            / abs(ref["lognormconst"])),
        "theta_mean_diff": float(res["theta_mean"] - ref["theta_mean"]),
        "theta_sd_diff": float(res["theta_sd"] - ref["theta_sd"]),
        "theta_q_diffs": [
            float(res["theta_q25"] - ref["theta_q25"]),
            float(res["theta_med"] - ref["theta_med"]),
            float(res["theta_q975"] - ref["theta_q975"])],
        # predict errors in units of the 95% band width (what a user
        # would see relative to the reported uncertainty)
        "pred_mean_maxerr_bandunits": float(np.max(
            np.abs(res["pred_mean"] - ref["pred_mean"]) / band)),
        "pred_lo_maxerr_bandunits": float(np.max(
            np.abs(res["pred_lo"] - ref["pred_lo"]) / band)),
        "pred_hi_maxerr_bandunits": float(np.max(
            np.abs(res["pred_hi"] - ref["pred_hi"]) / band)),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    if "--cpu" in sys.argv:
        main_cpu(sys.argv[sys.argv.index("--cpu") + 1])
    else:
        main_accel()
