"""Packed FD/node phase of the fused 1d fit vs the sequential scans.

build_fused_run_1d(packed_nodes=True) runs the FD Hessian pair and the
k node evaluations as lane-packed batched Laplace passes
(aghq._packed_lane_view / _packed_node_phase); the sequential path
chains warm states across nodes instead. Converged quantities must
agree to inner-Newton tolerance, and the optimizer trajectory (mode)
must be IDENTICAL (the packed phase starts after the while_loop).
"""
import numpy as np
import jax
import jax.numpy as jnp

from bayesgp_tpu import terms as T
from bayesgp_tpu.model import build as B
from bayesgp_tpu.fast.iwp import build_fast_iwp
from bayesgp_tpu.inference.aghq import (build_fused_run_1d,
                                        _packed_lane_view)


def _backend(n=600, k=14, seed=0, family="Poisson"):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0.0, 6.0, n))
    f_true = 0.8 * np.sin(x) + 1.0
    if family == "Poisson":
        y = rng.poisson(np.exp(f_true)).astype(np.float64)
    else:
        y = rng.binomial(1, 1 / (1 + np.exp(-(f_true - 1.0)))
                         ).astype(np.float64)
    inst = T.build_iwp_term("x", x, order=3, k=k, materialize_B=False)
    dmf = [np.ones((n, 1)), rng.normal(size=(n, 1))]
    md = B.build_model_data([inst], dmf, y, family, dense_design=False)
    xf = np.concatenate([inst.X] + dmf, axis=1)
    pt = np.full(xf.shape[1], 0.01)
    return build_fast_iwp(inst, md, xf, pt, np.zeros_like(pt),
                          inst.x_data)


def test_eligibility():
    be = _backend()
    assert _packed_lane_view(be, 4) is not None
    # far beyond lane capacity -> ineligible
    assert _packed_lane_view(be, 1000) is None


def test_packed_matches_sequential_poisson():
    be = _backend()
    run_seq = jax.jit(build_fused_run_1d(be, 4, jit=False,
                                         packed_nodes=False))
    run_pk = jax.jit(build_fused_run_1d(be, 4, jit=False,
                                        packed_nodes=True,
                                        packed_opt=False))
    th0 = jnp.asarray(0.0)
    m1, H1, nd1, nl1, st1 = run_seq(th0, be.init_state())
    m2, H2, nd2, nl2, st2 = run_pk(th0, be.init_state())
    assert float(m1) == float(m2)          # identical optimizer
    assert abs(float(H1) - float(H2)) < 1e-6 * (1 + abs(float(H1)))
    np.testing.assert_allclose(np.asarray(nl1), np.asarray(nl2),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(nd1), np.asarray(nd2),
                               atol=1e-7)
    np.testing.assert_allclose(np.asarray(st1[0]), np.asarray(st2[0]),
                               atol=1e-7)   # V per node
    np.testing.assert_allclose(np.asarray(st1[1]), np.asarray(st2[1]),
                               atol=1e-7)   # tail per node
    # sampling through the packed states (scalar factor format)
    key = jax.random.PRNGKey(0)
    idx = jnp.asarray(np.arange(60) % 4, jnp.int32)
    s1 = be.sample_traceable(key, st1, idx, 60)
    s2 = be.sample_traceable(key, st2, idx, 60)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                               atol=5e-6)


def _lognormconst_1d(H, nlls, k=4):
    from bayesgp_tpu.inference.aghq import ghe_rule, _logsumexp_np
    _, w1 = ghe_rule(k)
    Lad = 1.0 / np.sqrt(max(abs(float(H)), 1e-8))
    return _logsumexp_np(-np.asarray(nlls) + np.log(w1) + np.log(Lad))


def _ladder_vs_sequential(be, th0=0.0, k=4):
    """Auto (ladder) vs sequential program: optimizer-tolerance parity."""
    run_seq = jax.jit(build_fused_run_1d(be, k, jit=False,
                                         packed_nodes=False,
                                         return_states=False))
    run_lad = jax.jit(build_fused_run_1d(be, k, jit=False,
                                         packed_opt=True,
                                         return_states=False))
    th = jnp.asarray(th0)
    m1, H1, nd1, nl1 = run_seq(th, be.init_state())
    m2, H2, nd2, nl2 = run_lad(th, be.init_state())
    m1, m2, H1, H2 = float(m1), float(m2), float(H1), float(H2)
    # both optimizers stop at |Newton correction| < 1e-4 (f64: the
    # ladder lands much tighter; the march's own landing error is
    # the bound here)
    assert abs(m1 - m2) < 2e-4 * (1.0 + abs(m1)), (m1, m2)
    assert abs(H1 - H2) < 5e-3 * abs(H1), (H1, H2)
    # lognormconst is stationary at the mode: second-order insensitive
    l1 = _lognormconst_1d(H1, nl1, k)
    l2 = _lognormconst_1d(H2, nl2, k)
    assert abs(l1 - l2) < 1e-5 * (1.0 + abs(l1)), (l1, l2)
    return m1, m2


def test_ladder_matches_sequential_poisson():
    _ladder_vs_sequential(_backend())


def test_ladder_matches_sequential_binomial():
    _ladder_vs_sequential(_backend(family="Binomial", seed=3))


def test_ladder_warm_start():
    """theta0 already at the mode: pass 0 brackets immediately and the
    ladder converges without EM marches."""
    be = _backend(seed=5)
    run_seq = jax.jit(build_fused_run_1d(be, 4, jit=False,
                                         packed_nodes=False,
                                         return_states=False))
    m1 = float(run_seq(jnp.asarray(0.0), be.init_state())[0])
    _ladder_vs_sequential(be, th0=m1)


def test_ladder_negative_start_and_mode_scale():
    """Strong smooth signal (larger sigma -> smaller theta): the ladder
    agrees with the march wherever the mode lands, from a start on the
    other side."""
    rng = np.random.default_rng(11)
    n = 800
    x = np.sort(rng.uniform(0.0, 8.0, n))
    f_true = 2.5 * np.sin(1.7 * x)
    y = rng.poisson(np.exp(f_true)).astype(np.float64)
    inst = T.build_iwp_term("x", x, order=3, k=16, materialize_B=False)
    dmf = [np.ones((n, 1))]
    md = B.build_model_data([inst], dmf, y, "Poisson",
                            dense_design=False)
    xf = np.concatenate([inst.X] + dmf, axis=1)
    pt = np.full(xf.shape[1], 0.01)
    be = build_fast_iwp(inst, md, xf, pt, np.zeros_like(pt),
                        inst.x_data)
    _ladder_vs_sequential(be, th0=12.0)


def test_packed_matches_sequential_binomial():
    be = _backend(family="Binomial", seed=3)
    run_seq = jax.jit(build_fused_run_1d(be, 4, jit=False,
                                         packed_nodes=False,
                                         return_states=False))
    run_pk = jax.jit(build_fused_run_1d(be, 4, jit=False,
                                        packed_nodes=True,
                                        packed_opt=False,
                                        return_states=False))
    th0 = jnp.asarray(0.0)
    m1, H1, nd1, nl1 = run_seq(th0, be.init_state())
    m2, H2, nd2, nl2 = run_pk(th0, be.init_state())
    assert float(m1) == float(m2)
    np.testing.assert_allclose(np.asarray(nl1), np.asarray(nl2),
                               rtol=0, atol=1e-6)
