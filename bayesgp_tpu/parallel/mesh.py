"""Multi-chip execution: batched replicate fits sharded over a device mesh.

The reference's only process-level parallelism is a PSOCK cluster mapping
independent `model_fit` calls over a grid (R/02_model_fit.R:754-769), plus
the serially-executed AGHQ node loop inside aghq. The TPU-native design
exposes both as parallel axes of one SPMD program:

    mesh axes: ('fits', 'quad')
      fits — independent replicate fits / grid values (data parallel, ICI)
      quad — adaptive Gauss-Hermite quadrature nodes of each fit

A batched fit is a single jitted computation: vmap over replicates
(different y / design values, same shapes) x vmap over quadrature nodes,
with `jax.sharding.NamedSharding` placing each axis on the mesh. XLA
inserts the (trivial: result-gather only) collectives; no cross-device
communication is needed during the Newton solves themselves, so scaling
is embarrassingly linear over ICI.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..inference import laplace as laplace_mod
from ..inference.aghq import product_grid


def make_mesh(devices=None, axis_names=("fits",), shape=None):
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("provide shape for multi-axis meshes")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def batch_model_data(md, y_batch):
    """Replicate a ModelData over a leading batch axis with per-replicate
    responses (same design). Returns a ModelData whose `y` is (R, n)."""
    return dataclasses.replace(md, y=jnp.asarray(y_batch))


def _nll_one(theta, y, md):
    mdr = dataclasses.replace(md, y=y)
    return laplace_mod.laplace_nll(theta, mdr)


def batched_laplace_grid(md, y_batch, theta_nodes):
    """vmap(fits) x vmap(quad): laplace nll + latent mode at every
    (replicate, node) pair. Shapes: y_batch (R, n), theta_nodes (J, s).
    Returns (nll (R, J), W_star (R, J, w))."""
    def per_fit(y):
        return jax.vmap(lambda th: _nll_one(th, y, md))(theta_nodes)

    return jax.vmap(per_fit)(jnp.asarray(y_batch))


def sharded_batched_laplace(mesh, md, y_batch, theta_nodes):
    """The batched grid evaluation with explicit input/output shardings:
    replicates over 'fits', quadrature nodes over 'quad' (if present)."""
    axes = mesh.axis_names
    quad = "quad" if "quad" in axes else None
    y_sharding = NamedSharding(mesh, P("fits", None))
    th_sharding = NamedSharding(mesh, P(quad, None))
    out_shardings = (NamedSharding(mesh, P("fits", quad)),
                     NamedSharding(mesh, P("fits", quad, None)))

    fn = jax.jit(
        partial(batched_laplace_grid, md),
        in_shardings=(y_sharding, th_sharding),
        out_shardings=out_shardings)
    return fn(jnp.asarray(y_batch), jnp.asarray(theta_nodes))


def batched_outer_step(md, y_batch, thetas):
    """One full outer training step per replicate: laplace nll value and
    exact theta-gradient (through the refined inner Newton solve).

    This is the unit of work `model_fit_loop` / replicate studies repeat;
    vmapped over the batch it is one SPMD program.
    """
    def one(theta, y):
        mdr = dataclasses.replace(md, y=y)
        val, grad = jax.value_and_grad(
            lambda th: laplace_mod.laplace_nll(th, mdr)[0])(theta)
        return val, grad

    return jax.vmap(one)(jnp.asarray(thetas), jnp.asarray(y_batch))


def sharded_outer_step(mesh, md, y_batch, thetas):
    """batched_outer_step jitted with 'fits'-axis shardings on a mesh."""
    shard_b = NamedSharding(mesh, P("fits"))
    fn = jax.jit(partial(batched_outer_step, md),
                 in_shardings=(shard_b, shard_b),
                 out_shardings=(shard_b, shard_b))
    return fn(y_batch, thetas)
