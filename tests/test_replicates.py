"""Mesh-sharded replicate fits (BASELINE stretch configuration) on the
fast backend: correctness vs independent single fits, and sharding over
the virtual 8-device mesh (conftest)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from bayesgp_tpu import terms as T
from bayesgp_tpu.model import build as B
from bayesgp_tpu.fast.iwp import build_fast_iwp
from bayesgp_tpu.inference import aghq
from bayesgp_tpu.parallel.replicates import replicate_fits


def _backend(n=400, k=12, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.uniform(0.0, 4.0, n))
    f = 1.2 + 0.6 * np.sin(2 * np.pi * x / 2.5)
    y = rng.poisson(np.exp(f)).astype(np.float64)
    inst = T.build_iwp_term("x", x, order=2, k=k, materialize_B=False)
    dmf = [np.ones((n, 1))]
    md = B.build_model_data([inst], dmf, y, "Poisson", dense_design=False)
    xf = np.concatenate([inst.X] + dmf, axis=1)
    prior_tail = np.full(xf.shape[1], 0.01)
    be = build_fast_iwp(inst, md, xf, prior_tail,
                        np.zeros_like(prior_tail), inst.x_data)
    return be, x, f


def _replicate_ys(x, f, R, seed=1):
    rng = np.random.default_rng(seed)
    return np.stack([rng.poisson(np.exp(f)).astype(np.float64)
                     for _ in range(R)])


def test_replicates_match_single_fits():
    be, x, f = _backend()
    ys = _replicate_ys(x, f, R=2)
    modes, lncs = replicate_fits(be, ys, k=4)
    for i in range(2):
        b2 = be.with_y(jnp.asarray(ys[i]))
        fit = aghq.aghq_fit(b2, k=4)
        # replicate programs run the scalar march (packed_nodes=False
        # under lax.map); single fits use the lane-packed theta ladder —
        # agreement is to optimizer tolerance, and lognormconst is
        # stationary at the mode
        assert abs(float(modes[i]) - float(fit.mode[0])) < 2e-4
        assert abs(float(lncs[i]) - fit.lognormconst) < 1e-5


def test_replicates_sharded_over_mesh():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs the virtual multi-device mesh")
    mesh = jax.sharding.Mesh(np.asarray(devs[:4]), ("fits",))
    be, x, f = _backend()
    ys = _replicate_ys(x, f, R=8)
    modes_s, lncs_s = replicate_fits(be, ys, k=4, mesh=mesh)
    modes, lncs = replicate_fits(be, ys, k=4)
    np.testing.assert_allclose(modes_s, modes, atol=1e-8)
    np.testing.assert_allclose(lncs_s, lncs, atol=1e-8)
