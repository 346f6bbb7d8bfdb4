"""One-dispatch fit + posterior draws + predict (round-13 feature).

`model_fit(predict_at=(var, xs))` computes the predict summaries for a
GP component AS PART OF THE FIT: on the fused fast path (s=1 IWP
models) the optimizer, the quadrature, the M posterior draws, and the
predict mean/95% band all leave the accelerator in ONE dispatch —
measured 1.99 s for fit + 3000 draws + 1e5 prediction points at the
n=1e5/k=2000 headline config (vs 0.31 s fit + 3.87 s separate predict;
BENCH_NOTES.md round 13).

Reference workflow anchor: every vignette fits then predicts
(/root/reference/R/03_post_fit.R:44-125); the reference has no fused
equivalent.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax

# CPU demo config (see CLAUDE.md: JAX_PLATFORMS env is ignored here)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import bayesgp_tpu as bg  # noqa: E402

rng = np.random.default_rng(0)
n = 2000
x = np.sort(rng.uniform(0.0, 50.0, n))
y = rng.poisson(np.exp(1.0 + 0.6 * np.sin(2 * np.pi * x / 15.0)))

xs = np.linspace(0.0, 50.0, 500)
fit = bg.model_fit(
    "y ~ f(x, model='IWP', order=3, k=60)",
    data={"y": y.astype(float), "x": x},
    family="Poisson", M=1000, seed=1, engine="banded",
    predict_at=("x", xs),
)

pred = fit.predictions["x"]          # computed inside the fit program
print("fused predict:", fit.mod.prepredicted is not None)
print("mean[0:3] =", np.round(pred["mean"][:3], 4))
print("band width median =",
      np.round(np.median(pred["pupper"] - pred["plower"]), 4))

# identical information through the regular post-fit path
pred2 = fit.predict("x", newdata={"x": xs})
print("max |fused - postfit| mean diff:",
      float(np.abs(pred["mean"] - pred2["mean"]).max()))
