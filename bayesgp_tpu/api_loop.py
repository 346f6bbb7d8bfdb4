"""model_fit_loop — grid empirical Bayes over one scalar
(reference R/02_model_fit.R:706-778).

Refits the model for each value of the looping variable, collects log
marginal likelihoods, and normalizes exp(log_ml + log prior) over the grid
by the trapezoid rule. The reference parallelizes with a PSOCK process
cluster; fits here are independent JAX programs (batched/sharded variants
live in bayesgp_tpu.parallel).
"""
from __future__ import annotations

import numpy as np

from .api import model_fit


def _trapezoid(x, y):
    """sfsmisc::integrate.xy equivalent (reference R/02_model_fit.R:774)."""
    return float(np.trapezoid(y, x))


def model_fit_loop(loop_values, formula=None, data=None, loop_holder="LOOP",
                   prior_func=None, **kwargs):
    """Fit the model once per value of the loop variable.

    The loop value is exposed to the formula's f() options under the name
    `loop_holder` via the evaluation env (the reference rewrites default
    args/environments, R/02_model_fit.R:745-752).

    Returns dict(var=grid, post=normalized posterior, log_ml=log marginal
    likelihoods).
    """
    if prior_func is None:
        prior_func = lambda x: np.ones_like(np.asarray(x, float))
    log_ml = []
    for v in loop_values:
        env = dict(kwargs.pop("env", None) or {})
        env[loop_holder] = v
        fit = model_fit(formula=formula, data=data, env=env, **kwargs)
        log_ml.append(fit.mod.lognormconst)
    log_ml = np.asarray(log_ml)
    log_joint = log_ml + np.log(prior_func(np.asarray(loop_values, float)))
    log_joint = log_joint - log_joint.max()
    post = np.exp(log_joint)
    post = post / _trapezoid(np.asarray(loop_values, float), post)
    return {"var": np.asarray(loop_values), "post": post, "log_ml": log_ml}
