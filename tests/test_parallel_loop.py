"""Sharded model_fit_loop(parallel=True): the grid of fits runs as one
vmapped SPMD program over the device mesh (the reference's PSOCK cluster
equivalent, R/02_model_fit.R:754-769) and reproduces the sequential
log marginal likelihoods."""
import numpy as np
import jax
import pytest

import bayesgp_tpu as bg
from bayesgp_tpu.parallel.mesh import make_mesh
from bayesgp_tpu.parallel.loop import fused_lognormconst, parallel_lognormconst


def _cyclic_data(n=100, seed=8, period=10.0):
    rng = np.random.default_rng(seed)
    year = np.linspace(0, 40, n)
    eta = 0.6 * np.sin(2 * np.pi * year / period) + 1.2
    y = rng.poisson(np.exp(eta)).astype(float)
    return {"year": year, "y": y}


FORMULA = "y ~ f(x=year, model='sGP', period=LOOP, k=20)"


def test_fused_lognormconst_matches_aghq_fit():
    """The all-inside-jit lognormconst equals the host-driven aghq_fit
    value to optimizer tolerance."""
    data = _cyclic_data()
    from bayesgp_tpu.api import assemble_model
    asm = assemble_model(formula=FORMULA, data=data, family="Poisson",
                         env={"LOOP": 10.0}, engine="dense")
    fit = bg.model_fit(FORMULA, data=data, family="Poisson", method="aghq",
                       M=10, env={"LOOP": 10.0})
    val = float(jax.jit(fused_lognormconst)(asm["md"]))
    assert abs(val - fit.mod.lognormconst) < 1e-4


def test_parallel_loop_matches_sequential():
    data = _cyclic_data()
    periods = np.array([8.0, 10.0, 13.0])
    seq = bg.model_fit_loop(
        loop_values=periods, formula=FORMULA, data=data, family="Poisson",
        method="aghq", M=10, loop_holder="LOOP")
    par = bg.model_fit_loop(
        loop_values=periods, formula=FORMULA, data=data, family="Poisson",
        method="aghq", M=10, loop_holder="LOOP", parallel=True)
    np.testing.assert_allclose(par["log_ml"], seq["log_ml"], atol=1e-4)
    np.testing.assert_allclose(par["post"], seq["post"], rtol=1e-3)


def test_parallel_loop_sharded_over_mesh():
    """Grid sharded over the 8-device virtual mesh (pads 5 -> 8)."""
    data = _cyclic_data()
    periods = np.array([6.0, 8.0, 10.0, 13.0, 16.0])
    mesh = make_mesh(axis_names=("fits",))
    assert int(np.prod(mesh.devices.shape)) == 8
    par = bg.model_fit_loop(
        loop_values=periods, formula=FORMULA, data=data, family="Poisson",
        method="aghq", M=10, loop_holder="LOOP", parallel=True, mesh=mesh)
    assert par["log_ml"].shape == (5,)
    assert periods[np.argmax(par["log_ml"])] == 10.0
    assert np.isclose(np.trapezoid(par["post"], periods), 1.0)


def test_loop_warm_start_matches_cold():
    """warm_start=True (each grid fit starts at the previous mode) gives
    the same marginal likelihoods as reference-exact cold starts."""
    data = _cyclic_data()
    periods = np.array([8.0, 10.0, 13.0])
    warm = bg.model_fit_loop(
        loop_values=periods, formula=FORMULA, data=data, family="Poisson",
        method="aghq", M=10, loop_holder="LOOP", warm_start=True)
    cold = bg.model_fit_loop(
        loop_values=periods, formula=FORMULA, data=data, family="Poisson",
        method="aghq", M=10, loop_holder="LOOP", warm_start=False)
    np.testing.assert_allclose(warm["log_ml"], cold["log_ml"], atol=1e-5)
    np.testing.assert_allclose(warm["post"], cold["post"], rtol=1e-4)
