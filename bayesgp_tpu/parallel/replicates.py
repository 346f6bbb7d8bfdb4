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
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..inference import aghq


def _mesh_key(mesh, axis):
    if mesh is None:
        return None
    return (axis, tuple(sorted(mesh.shape.items())),
            tuple(d.id for d in mesh.devices.flat))


def _prog_cache(backend):
    cache = getattr(backend, "_replicate_progs", None)
    if cache is None:
        cache = backend._replicate_progs = {}
    return cache


def _device_args(backend):
    """Backend O(n) arrays as a device-resident argument tree, uploaded
    ONCE per backend (jnp.asarray of a numpy leaf re-uploads per call)."""
    from ..fast.iwp import backend_device_args

    arrs = getattr(backend, "_replicate_device_args", None)
    if arrs is None:
        arrs = jax.tree_util.tree_map(jnp.asarray,
                                      backend_device_args(backend))
        backend._replicate_device_args = arrs
    return arrs


def replicate_fits(backend, ys, k: int = 4, mesh: Mesh = None,
                   axis: str = "fits"):
    """AGHQ-fit R replicate responses on one design.

    backend: a fast backend exposing `with_y` (fast/iwp.py);
    ys: (R, n) responses in RAW data order;
    mesh: optional Mesh with `axis`; R must divide by its size.

    Returns (modes (R,), lognormconsts (R,)) as numpy arrays.
    """
    from ..fast.iwp import backend_rebind

    ys = jnp.asarray(ys)
    R = ys.shape[0]
    kq = k
    z, logw_base = aghq.product_grid(kq, 1)
    logw_base = jnp.asarray(logw_base)
    # O(n) design arrays enter as (replicated) ARGUMENTS, not embedded
    # program constants — see inference/aghq._lifted_jit
    arrs0 = _device_args(backend)

    def one(be, y):
        b2 = be.with_y(y)
        # packed_nodes=False: this program runs under lax.map/shard_map
        # over replicates — nesting the lane-packed batched kernels
        # under an outer map is exactly the map->while->scan Mosaic
        # pattern that faults the TPU worker (CLAUDE.md fact 4)
        run = aghq.build_fused_run_1d(b2, kq, jit=False,
                                      return_states=False,
                                      packed_nodes=False)
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

    def local_map(arrs, ys_local):
        be = backend_rebind(backend, arrs)
        return jax.lax.map(lambda y: one(be, y), ys_local)

    # memoize the jitted program on the backend: a fresh jax.jit around
    # a per-call closure would RE-TRACE on every call (measured: ~50 s
    # of retrace + persistent-cache rebuild per "steady" call at the
    # headline scale, vs ~0.4 s/fit of actual device time)
    cache = _prog_cache(backend)
    pkey = ("map", kq, _mesh_key(mesh, axis))
    if mesh is None:
        if pkey not in cache:
            cache[pkey] = jax.jit(local_map)
        modes, lncs = cache[pkey](arrs0, ys)
    else:
        if R % mesh.shape[axis]:
            raise ValueError(
                f"R={R} must be a multiple of the '{axis}' axis size "
                f"{mesh.shape[axis]}")
        if pkey not in cache:
            fn = shard_map(local_map, mesh=mesh,
                           in_specs=(P(), P(axis)), out_specs=P(axis))
            cache[pkey] = jax.jit(fn)
        ys = jax.device_put(ys, NamedSharding(mesh, P(axis)))
        modes, lncs = cache[pkey](arrs0, ys)
    return np.asarray(modes), np.asarray(lncs)


def replicate_fits_packed(backend, ys, k: int = 4, mesh: Mesh = None,
                          axis: str = "fits", force_engine: str = None):
    """AGHQ-fit R replicates with the LANE-PACKED batched backend:
    within a chip, up to 128/G replicates share every band
    factorization/solve in one Pallas kernel pass and every O(n) design
    pass as one batched MXU program (fast/batched.py) — versus
    `replicate_fits`' sequential per-replicate `lax.map`. Across chips,
    the replicate axis shards over `mesh` as usual.

    backend: FastIWPBackend (chunked design, 1 hyperparameter);
    ys: (R, n) responses in RAW data order.
    Returns (modes (R,), lognormconsts (R,)) as numpy arrays.
    """
    from ..fast.batched import (ll_const_np, make_batched,
                                make_engine_batched, max_replicates)
    from ..fast.iwp import backend_rebind
    from ..inference.aghq import build_fused_run_1d_batched

    arrs0 = _device_args(backend)
    ys = np.asarray(ys)
    R, _ = ys.shape
    NRmax = max_replicates(backend.p)
    ys_int = ys[:, np.asarray(backend.row_order)]
    llc = ll_const_np(backend, ys_int)
    z, logw_base = aghq.product_grid(k, 1)
    logw_base = np.asarray(logw_base)

    def lnc_of(nlls, H):
        """(R?, k), (R?,) -> per-replicate lognormconst (traceable)."""
        Lad = jax.lax.rsqrt(jnp.maximum(jnp.abs(H), 1e-8))
        lw = -nlls + (jnp.asarray(logw_base)[None]
                      + jnp.log(Lad)[:, None])
        m = jnp.max(lw, axis=1)
        return m + jnp.log(jnp.sum(jnp.exp(lw - m[:, None]), axis=1))

    cache = _prog_cache(backend)
    if mesh is None:
        # single chip: groups of NRmax through ONE compiled program
        # (responses are arguments, so every group — and every CALL —
        # reuses the program; see replicate_fits on why the jit must
        # be memoized on the backend)
        NRg = min(R, NRmax)
        pkey = ("packed", k, NRg, force_engine, None)
        if pkey not in cache:
            eng = make_engine_batched(backend, NRg, force_engine)

            @jax.jit
            def run_group(arrs, Yg, llcg):
                bbg = make_batched(backend_rebind(backend, arrs), Yg,
                                   llcg, NRg, eng)
                run = build_fused_run_1d_batched(bbg, k, jit=False)
                th0 = jnp.zeros((NRg,), backend.dtype)
                mode, H, _, nlls = run(th0, bbg.init_state())
                return mode, lnc_of(nlls, H)

            cache[pkey] = run_group
        run_group = cache[pkey]

        pad = (-R) % NRg
        if pad:
            ys_int = np.concatenate([ys_int, ys_int[-1:].repeat(pad, 0)])
            llc = np.concatenate([llc, llc[-1:].repeat(pad)])
        modes, lncs = [], []
        for g0 in range(0, ys_int.shape[0], NRg):
            m, l = run_group(arrs0, jnp.asarray(ys_int[g0:g0 + NRg]),
                             jnp.asarray(llc[g0:g0 + NRg]))
            modes.append(np.asarray(m))
            lncs.append(np.asarray(l))
        return (np.concatenate(modes)[:R], np.concatenate(lncs)[:R])

    n_dev = mesh.shape[axis]
    if R % n_dev:
        raise ValueError(
            f"R={R} must be a multiple of the '{axis}' axis size {n_dev}")
    Rloc = R // n_dev
    if Rloc > NRmax:
        raise ValueError(
            f"{Rloc} replicates/chip exceed the lane-group capacity "
            f"{NRmax} at order {backend.p}; use more chips or "
            f"replicate_fits")
    pkey = ("packed", k, Rloc, force_engine, _mesh_key(mesh, axis))
    if pkey not in cache:
        eng = make_engine_batched(backend, Rloc, force_engine)

        def local_fn(arrs, Yl, llcl):
            bbl = make_batched(backend_rebind(backend, arrs), Yl, llcl,
                               Rloc, eng)
            run = build_fused_run_1d_batched(bbl, k, jit=False)
            # tie the starts to the data so every while-loop carry
            # begins sharding-'varying' (see replicate_fits)
            zy = jnp.asarray(0.0, backend.dtype) * Yl[0, 0].astype(
                backend.dtype)
            th0 = jnp.zeros((Rloc,), backend.dtype) + zy
            st0 = jax.tree_util.tree_map(
                lambda a: a + zy.astype(a.dtype), bbl.init_state())
            mode, H, _, nlls = run(th0, st0)
            return mode, lnc_of(nlls, H)

        cache[pkey] = jax.jit(shard_map(
            local_fn, mesh=mesh, in_specs=(P(), P(axis), P(axis)),
            out_specs=(P(axis), P(axis))))
    Yd = jax.device_put(jnp.asarray(ys_int),
                        NamedSharding(mesh, P(axis)))
    ld = jax.device_put(jnp.asarray(llc), NamedSharding(mesh, P(axis)))
    modes, lncs = cache[pkey](arrs0, Yd, ld)
    return np.asarray(modes), np.asarray(lncs)
