"""Observation-axis (data-parallel) sharding of ONE large fit.

The reference has no single-fit parallelism at all (SURVEY.md §2.3: its
only concurrency is a PSOCK cluster over independent fits,
R/02_model_fit.R:754-769); its large-n story is sparsity on one CPU.
On TPU the idiomatic scale-out for a single n >> 1e6 fit is to shard
the OBSERVATION axis over the device mesh:

  - every O(n) pass of the fast backend — the chunked windowed-design
    products (eta, B^T r), the per-chunk Gram bands (band_H, C_block)
    and the likelihood reductions — partitions over the CHUNK axis of
    the MXU design (ChunkDesign.D / XFp_rows, the only O(n·w) arrays):
    each device computes its local chunks' (CH, w) contributions on its
    own MXU;
  - the raw (n,)-shaped arrays (y, size, XFpT) stay REPLICATED: GSPMD
    slices a replicated operand locally when it meets a sharded one, so
    they cost no communication, and at n = 1e6 they are ~8 MB/device —
    noise next to the sharded (nc, CH, w) design;
  - the O(d) solver state (band factorization, latent coordinates,
    Newton/AGHQ control flow) is replicated: at d ~ 2e3 it is far
    cheaper to recompute per device than to communicate;
  - the only cross-device traffic is the reduction of the small window
    contributions ((nc, w) vectors, (nc, p+1, w) band pieces, (q, q)
    Grams, scalar log-likelihoods) — all-reduces of a few hundred KB
    per Newton step over ICI.

Implementation: pure GSPMD. The chunk arrays are device_put with
`NamedSharding(mesh, P('data'))` (chunk count zero-padded to a mesh
multiple — padded chunks contribute exact zeros and are skipped by the
overlap-add rounds via ChunkDesign.nc_real); the fused AGHQ programs
already lift every O(n) backend array to ARGUMENTS
(inference/aghq._lifted_jit — jit materializes closure-captured arrays
as replicated constants) and XLA's SPMD partitioner inserts the
collectives. No shard_map, no changes in the compute path — the
sharding IS the program transform.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices=None, axis: str = "data") -> Mesh:
    """A 1-D mesh over `devices` (default: all) named for data sharding."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def pad_chunks(ck, mult: int):
    """ChunkDesign with the chunk axis zero-padded to a multiple of
    `mult`. Padded chunks have D = XFp_rows = 0 (exact-zero einsum
    contributions) and are excluded from the overlap-add rounds
    (nc_real), so every consumer is bit-identical to the unpadded
    design."""
    nc_real = ck.nc_real or ck.nc
    nc_pad = -(-ck.nc // mult) * mult
    if nc_pad == ck.nc:
        return ck if ck.nc_real else dataclasses.replace(ck, nc_real=nc_real)
    extra = nc_pad - ck.nc
    D = jnp.concatenate(
        [jnp.asarray(ck.D),
         jnp.zeros((extra,) + np.shape(ck.D)[1:], jnp.asarray(ck.D).dtype)])
    XF = jnp.concatenate(
        [jnp.asarray(ck.XFp_rows),
         jnp.zeros((extra,) + np.shape(ck.XFp_rows)[1:],
                   jnp.asarray(ck.XFp_rows).dtype)])
    bases = np.concatenate([np.asarray(ck.bases), np.zeros(extra, int)])
    return dataclasses.replace(ck, D=D, XFp_rows=XF, bases=bases,
                               nc=nc_pad, nc_real=nc_real)


def shard_backend_data(be, mesh: Mesh, axis: str = None):
    """Copy of a chunked fast backend (FastIWPBackend/BandedBackend)
    with its O(n·w) chunk arrays sharded over `axis` of `mesh`;
    everything else stays replicated. axis=None uses the mesh's only
    axis (explicit name required for multi-axis meshes).

    The returned backend is a drop-in for every inference entry point
    (aghq_fit / fused fits / laplace_nll / sampling): the fused jit
    programs lift the sharded arrays to arguments (fused_fit_1d) and
    execute SPMD over the mesh. Requires the chunked (MXU) design — the
    gather path's (n,)-indexed loads would shard poorly anyway."""
    ck = getattr(be, "chunks", None)
    if ck is None:
        raise ValueError(
            "data sharding requires the chunked (MXU) design; this "
            "backend fell back to the gather path (clustered x gave a "
            "window wider than 64 columns)")
    if axis is None:
        if len(mesh.axis_names) != 1:
            raise ValueError(
                f"multi-axis mesh {mesh.axis_names}: pass axis= explicitly")
        axis = mesh.axis_names[0]
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh has no axis named {axis!r}")

    ck = pad_chunks(ck, int(mesh.shape[axis]))
    sh_chunks = NamedSharding(mesh, P(axis))        # (nc, CH, *) on nc
    ck = dataclasses.replace(
        ck,
        D=jax.device_put(jnp.asarray(ck.D), sh_chunks),
        XFp_rows=jax.device_put(jnp.asarray(ck.XFp_rows), sh_chunks))
    return dataclasses.replace(be, chunks=ck, data_sharded=(mesh, axis))


# The argument-lifting itself lives in fast/iwp.backend_device_args /
# backend_rebind and is applied UNCONDITIONALLY by the fused program
# builders (inference/aghq._lifted_jit): every fast backend's O(n)
# arrays enter as arguments (smaller serialized programs), so a
# data-sharded backend needs no special program transform — the
# NamedShardings placed here on the chunk arrays are simply what GSPMD
# sees on those arguments.
