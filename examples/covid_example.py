"""COVID mortality example (the reference README / covid vignette model:
new_deaths ~ weekday effects + IWP3 smooth in time, Poisson, AGHQ).

Run: python examples/covid_example.py
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
jax.config.update("jax_enable_x64", True)   # full-precision parity path

import numpy as np  # noqa: E402
import bayesgp_tpu as bg  # noqa: E402


def main():
    data = bg.datasets.covid_canada()
    fit = bg.model_fit(
        "new_deaths ~ weekdays1 + weekdays2 + weekdays3 + weekdays4 "
        "+ weekdays5 + weekdays6 + f(t, model='IWP', order=3, k=30)",
        data=data, family="Poisson", method="aghq", M=3000)

    fit.summary()

    # posterior of the smooth and its first two derivatives
    for degree in (0, 1, 2):
        pred = fit.predict("t", degree=degree)
        print(f"degree={degree}: mean in "
              f"[{pred['mean'].min():.3f}, {pred['mean'].max():.3f}]")

    print("\nPosterior table:")
    for row in fit.post_table():
        print(row)

    # persist and reload without re-running inference
    bg.save_fit(fit, "/tmp/covid_fit.npz")
    fit2 = bg.load_fit("/tmp/covid_fit.npz")
    print("\nreloaded lognormconst:", fit2.mod.lognormconst)


if __name__ == "__main__":
    main()
