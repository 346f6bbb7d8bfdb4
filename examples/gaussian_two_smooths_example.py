"""Gaussian family with two smooth terms (BASELINE.md benchmark
config 4): an IWP trend plus a seasonal sGP, k=100 each, so the AGHQ
grid is 3-dimensional (two smoothing thetas + the Gaussian noise
theta). On the banded engine the outer BFGS and the k^s node grid each
run as ONE device program (inference/aghq.build_fused_opt_nd /
build_fused_nodes — measured 3.1x vs the per-dispatch host loop on a
TPU v5 chip).

Run: python examples/gaussian_two_smooths_example.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# small vignette-scale models: run on CPU f64 by default (the
# in-environment TPU plugin otherwise wins and emulates f64 — minutes
# of compile); set BAYESGP_EXAMPLE_TPU=1 to run on the accelerator.
if not os.environ.get("BAYESGP_EXAMPLE_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import bayesgp_tpu as bg  # noqa: E402


def main():
    rng = np.random.default_rng(7)
    n = 2000
    x = np.sort(rng.uniform(0.0, 100.0, n))
    trend = 0.02 * x + 0.5 * np.sin(x / 25.0)
    seasonal = 0.6 * np.cos(2 * np.pi * x / 10.0)
    y = trend + seasonal + 0.25 * rng.normal(size=n)
    data = {"y": y, "x": x, "xs": x.copy()}

    fit = bg.model_fit(
        "y ~ f(x, model='IWP', order=2, k=100) "
        "+ f(xs, model='sGP', period=10, k=100)",
        data=data, family="Gaussian", method="aghq", M=2000,
        aghq_k=3, engine="banded")

    fit.summary()
    p_trend = fit.predict("x")
    p_seas = fit.predict("xs")
    print("trend posterior mean range:",
          float(p_trend["mean"].min()), "..", float(p_trend["mean"].max()))
    print("seasonal posterior mean range:",
          float(p_seas["mean"].min()), "..", float(p_seas["mean"].max()))
    tbl = fit.post_table()
    print("post_table rows:", list(tbl.keys())
          if isinstance(tbl, dict) else len(tbl))


if __name__ == "__main__":
    main()
