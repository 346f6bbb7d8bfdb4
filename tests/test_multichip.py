"""Sharded batched-fit tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import __graft_entry__ as ge
from bayesgp_tpu.parallel import mesh as pmesh


def test_entry_compiles():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))


def test_dryrun_multichip_8():
    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)


def test_sharded_matches_single_device():
    """Sharded batched laplace == per-replicate sequential results."""
    md = ge._tiny_model()
    rng = np.random.default_rng(3)
    R, J = 4, 4
    y_batch = np.stack([
        rng.poisson(np.exp(0.3 * np.sin(np.linspace(0, 4, md.n)) + 1.0)
                    ).astype(float) for _ in range(R)])
    theta_nodes = np.linspace(-0.5, 0.5, J).reshape(J, 1)

    m = pmesh.make_mesh(jax.devices()[:4], ("fits",), (4,))
    nlls, _ = pmesh.sharded_batched_laplace(m, md, y_batch, theta_nodes)

    import dataclasses
    from bayesgp_tpu.inference.laplace import laplace_nll
    for r in range(R):
        mdr = dataclasses.replace(md, y=jnp.asarray(y_batch[r]))
        for j in range(J):
            ref = float(laplace_nll(jnp.asarray(theta_nodes[j]), mdr)[0])
            assert np.isclose(float(nlls[r, j]), ref, rtol=1e-10), (r, j)
