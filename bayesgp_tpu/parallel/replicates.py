"""Mesh-sharded replicate fits on the FAST (banded) backends.

BASELINE.json's stretch configuration: the headline n=1e5/k=2000 fit,
batched over R independent replicate responses on the same design,
sharded over the device mesh. The reference's only analogue is the
PSOCK process cluster of `model_fit_loop` (R/02_model_fit.R:754-769);
here every replicate runs the fused single-program AGHQ fit
(inference/aghq.fused_fit_1d) and the batch is laid out over a 'fits'
mesh axis with `shard_map` — zero cross-device communication until the
final gather of (mode, lognormconst).

Within a device, replicates run under `jax.lax.map` (sequential — each
fit is itself a large parallel program; stacking fits would multiply
peak memory by the local batch).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..inference import aghq


def replicate_fits(backend, ys, k: int = 4, mesh: Mesh = None,
                   axis: str = "fits"):
    """AGHQ-fit R replicate responses on one design.

    backend: a fast backend exposing `with_y` (fast/iwp.py);
    ys: (R, n) responses in RAW data order;
    mesh: optional Mesh with `axis`; R must divide by its size.

    Returns (modes (R,), lognormconsts (R,)) as numpy arrays.
    """
    ys = jnp.asarray(ys)
    R = ys.shape[0]
    kq = k
    z, logw_base = aghq.product_grid(kq, 1)
    logw_base = jnp.asarray(logw_base)

    def one(y):
        b2 = backend.with_y(y)
        run = aghq.build_fused_run_1d(b2, kq, jit=False,
                                      return_states=False)
        # tie the initial latent state (and theta) to y so every loop
        # carry in the fused program starts sharding-'varying' under
        # shard_map (replicated-init/varying-output carries are rejected)
        zy = jnp.asarray(0.0, backend.dtype) * y[0].astype(backend.dtype)
        state0 = jax.tree_util.tree_map(
            lambda a: a + zy.astype(a.dtype), b2.init_state())
        mode, H, nodes, nlls = run(jnp.asarray(0.0, backend.dtype) + zy,
                                   state0)
        Lad = jax.lax.rsqrt(jnp.maximum(jnp.abs(H), 1e-8))
        logw = logw_base + jnp.log(Lad)
        lw = -nlls + logw
        m = jnp.max(lw)
        lnc = m + jnp.log(jnp.sum(jnp.exp(lw - m)))
        return mode, lnc

    def local_map(ys_local):
        return jax.lax.map(one, ys_local)

    if mesh is None:
        modes, lncs = jax.jit(local_map)(ys)
    else:
        from jax.experimental.shard_map import shard_map
        if R % mesh.shape[axis]:
            raise ValueError(
                f"R={R} must divide the '{axis}' axis size "
                f"{mesh.shape[axis]}")
        fn = shard_map(local_map, mesh=mesh,
                       in_specs=P(axis), out_specs=P(axis))
        ys = jax.device_put(ys, NamedSharding(mesh, P(axis)))
        modes, lncs = jax.jit(fn)(ys)
    return np.asarray(modes), np.asarray(lncs)
