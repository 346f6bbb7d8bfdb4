"""Case-crossover example on the bundled sim1data (the reference
Partial_Likelihood vignette: case ~ f(exposure, IWP2), family='cc',
strata='subject'; simulated truth 3(x^2 - 0.25)).

Run: python examples/case_crossover_example.py
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
    data = bg.datasets.sim1data()
    med = float(np.median(data["exposure"]))
    fit = bg.model_fit(
        "case ~ f(x=exposure, model='IWP', order=2, k=30, "
        f"initial_location={med})",
        data=data, family="cc", strata="subject", method="aghq", M=3000)

    grid = np.linspace(0.05, 0.95, 19)
    pred = fit.predict("exposure", newdata={"exposure": grid})
    truth = 3 * (grid ** 2 - 0.25) - (3 * (med ** 2 - 0.25))
    for g, m, t in zip(grid[::3], pred["mean"][::3], truth[::3]):
        print(f"x={g:.2f}  fitted={m:+.3f}  truth={t:+.3f}")


if __name__ == "__main__":
    main()
