"""model_fit_loop — grid empirical Bayes over one scalar
(reference R/02_model_fit.R:706-778).

Refits the model for each value of the looping variable, collects log
marginal likelihoods, and normalizes exp(log_ml + log prior) over the grid
by the trapezoid rule. The reference parallelizes with a PSOCK process
cluster; here `parallel=True` runs the whole grid as ONE vmapped program
sharded over the device mesh (bayesgp_tpu.parallel.loop) — the TPU-native
replacement for the cluster.
"""
from __future__ import annotations

import numpy as np

from .api import model_fit, assemble_model


def _trapezoid(x, y):
    """sfsmisc::integrate.xy equivalent (reference R/02_model_fit.R:774)."""
    return float(np.trapezoid(y, x))


def model_fit_loop(loop_values, formula=None, data=None, loop_holder="LOOP",
                   prior_func=None, parallel=False, mesh=None,
                   warm_start=True, **kwargs):
    """Fit the model once per value of the loop variable.

    The loop value is exposed to the formula's f() options under the name
    `loop_holder` via the evaluation env (the reference rewrites default
    args/environments, R/02_model_fit.R:745-752).

    parallel=True stacks the per-value models and evaluates every grid
    value's AGHQ lognormconst in one vmapped JAX program; pass `mesh`
    (jax.sharding.Mesh with a 'fits' axis, see parallel.mesh.make_mesh)
    to shard the grid over devices — the reference's PSOCK cluster
    (R/02_model_fit.R:754-769) gone SPMD.

    warm_start=True (serial path, method='aghq'): each grid fit starts
    the hyperparameter optimization at the previous value's posterior
    mode instead of theta=0 — neighboring grid models have neighboring
    modes, so this removes the cold-start optimizer iterations (the
    mode sits ~14 units from 0 at production scale). The results are
    the same fits (the optimizer converges to the same mode up to the
    usual fp noise); pass warm_start=False for reference-exact cold
    starts.

    Returns dict(var=grid, post=normalized posterior, log_ml=log marginal
    likelihoods).
    """
    if prior_func is None:
        prior_func = lambda x: np.ones_like(np.asarray(x, float))
    base_env = dict(kwargs.pop("env", None) or {})
    aghq_k = kwargs.get("aghq_k", 4)

    if parallel:
        from .parallel.loop import parallel_lognormconst
        asm_kwargs = {k: v for k, v in kwargs.items()
                      if k not in ("aghq_k", "M", "seed", "option_list")}
        mds = []
        for v in loop_values:
            env = dict(base_env)
            env[loop_holder] = v
            asm = assemble_model(formula=formula, data=data, env=env,
                                 engine="dense", **asm_kwargs)
            mds.append(asm["md"])
        log_ml = parallel_lognormconst(mds, k=aghq_k, mesh=mesh)
    else:
        log_ml = []
        th_prev = kwargs.pop("theta0", None)
        use_warm = warm_start and kwargs.get("method", "aghq") == "aghq"
        for v in loop_values:
            env = dict(base_env)
            env[loop_holder] = v
            fit = model_fit(formula=formula, data=data, env=env,
                            theta0=th_prev if use_warm else None,
                            **kwargs)
            log_ml.append(fit.mod.lognormconst)
            if use_warm:
                mode = getattr(fit.mod, "mode", None)
                if mode is not None and np.all(np.isfinite(mode)):
                    th_prev = np.asarray(mode, float)
        log_ml = np.asarray(log_ml)

    log_joint = log_ml + np.log(prior_func(np.asarray(loop_values, float)))
    log_joint = log_joint - log_joint.max()
    post = np.exp(log_joint)
    post = post / _trapezoid(np.asarray(loop_values, float), post)
    return {"var": np.asarray(loop_values), "post": post, "log_ml": log_ml}
