"""Block-tridiagonal symmetric positive-definite linear algebra.

TPU-native replacement for the sparse (CHOLMOD) Cholesky the reference's
TMB runtime uses for the Laplace inner solves (SURVEY.md L0): a banded
matrix with one-sided bandwidth b <= s is stored as nb blocks of size s
(diagonals D_i and sub-diagonals E_i = block(i+1, i)), and factored by a
`lax.scan` whose per-step work is s x s Cholesky / triangular-solve /
matmul — MXU-shaped when s is a multiple of the tile size, and only
O(m/s) sequential steps instead of O(m) scalar ones.

All routines are jit/vmap/grad-compatible.

    factor:   H = L L^T,  L = (LD_i lower-tri, LE_i dense sub-blocks)
    arrowhead: H = [[Hb, C], [C^T, Hd]] handled by Schur complement
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from . import chol_kernels as ck


def _chol(A):
    if ck.use_blocked(A.dtype):
        return ck.cholesky_blocked(A)
    return jnp.linalg.cholesky(A)


# Jitter (relative to the mean diagonal) applied ONLY when a plain
# factorization produced non-finite pivots. Conditional Hessians at
# weak-theta evaluation points can be NUMERICALLY indefinite (measured
# round 14: lambda_min ~ -5e-7 on the equilibrated n=2e4 IWP+sGP system
# — the two smooth bases are nearly collinear and the exp(theta) P
# regularization is tiny there). The reference never sees this as NaN:
# TMB's Newton retreats on a failed CHOLMOD factor. Here the Laplace
# value must stay FINITE so the theta optimizer can walk out of the
# sick region — a NaN at theta0 left the on-chip s=3 optimizer stuck at
# its start and fed garbage nodes downstream.
CHOL_JITTER = 1e-4


def chol_guarded(A):
    """Cholesky with failure escalation. Healthy matrices factor
    BIT-IDENTICALLY (zero jitter added, surrogate not selected).
    Escalation: (1) plain factor; (2) + jitter*scale*I; (3) a
    diagonal-only surrogate that always factors — needed because a
    fixed elimination order on an essentially-singular matrix can
    produce INTERMEDIATE Schur blocks indefinite by O(1) (measured
    lambda_min -0.37 on block 1 of the theta=0 two-smooth system),
    beyond any small jitter. The surrogate's log-det/solves have the
    right magnitude, which is all the optimizer needs to walk out.
    Probes run on stop_gradient copies; the factored matrix is always
    finite, so no NaN reaches the gradients."""
    if A.shape[-1] == 0:
        return A
    s = A.shape[-1]
    eye = jnp.eye(s, dtype=A.dtype)
    Asg = jax.lax.stop_gradient(A)
    diag_sg = jnp.diagonal(Asg, axis1=-2, axis2=-1)
    scale = jnp.maximum(jnp.mean(jnp.abs(diag_sg)),
                        jnp.asarray(1e-30, A.dtype))

    def _ok(L):
        return jnp.all(jnp.isfinite(jnp.diagonal(L, axis1=-2, axis2=-1)))

    ok0 = _ok(_chol(Asg))
    jit = jnp.where(ok0, jnp.asarray(0.0, A.dtype),
                    (CHOL_JITTER * scale).astype(A.dtype))
    ok1 = _ok(_chol(Asg + jit * eye))
    dsafe = jnp.maximum(jnp.abs(jnp.diagonal(A, axis1=-2, axis2=-1)),
                        (1e-8 * scale).astype(A.dtype))
    surrogate = eye * dsafe[..., None, :]
    Afin = jnp.where(ok1, A + jit * eye, surrogate)
    return _chol(Afin)


def _solve_L(L, B):
    if ck.use_blocked(L.dtype):
        return ck.trsm_left_lower(L, B)
    return solve_triangular(L, B, lower=True)


def _solve_Lt(L, B):
    if ck.use_blocked(L.dtype):
        return ck.trsm_left_lower_t(L, B)
    return solve_triangular(L, B, lower=True, trans=1)


class BTFactor(NamedTuple):
    LD: jnp.ndarray   # (nb, s, s) lower-triangular diagonal blocks
    LE: jnp.ndarray   # (nb-1, s, s) sub-diagonal blocks of L


def band_to_blocks(band: jnp.ndarray, s: int):
    """Symmetric band storage -> block-tridiagonal blocks.

    band: (bw+1, m) with band[o, j] = A[j+o, j] (lower diagonals),
    zero-padded at the tail of each diagonal. Requires bw < s and
    m % s == 0 (pad the matrix with identity rows first if needed).
    Returns (D: (nb, s, s), E: (nb-1, s, s)).

    Built with STATIC diagonal placements (no data-dependent gathers —
    2D fancy indexing compiles catastrophically slowly on TPU).
    """
    bwp1, m = band.shape
    bw = bwp1 - 1
    nb = m // s
    dt = band.dtype

    # Diagonal blocks: D[g, b+o, b] = band[o, g*s+b] for b+o < s
    D = jnp.zeros((nb, s, s), dt)
    for o in range(bwp1):
        vals = band[o].reshape(nb, s)          # vals[g, b] = band[o, g*s+b]
        b_idx = jnp.arange(s - o)
        D = D.at[:, b_idx + o, b_idx].set(vals[:, :s - o])
    # symmetrize (upper from lower)
    D = D + jnp.triu(D.swapaxes(-1, -2), 1)

    # Sub-diagonal blocks: E[g, a, b] = A[(g+1)s+a, g*s+b], nonzero when
    # o = s + a - b in [1, bw]  =>  b = s - o + a, a in [0, o-1]
    if nb > 1:
        E = jnp.zeros((nb - 1, s, s), dt)
        for o in range(1, bwp1):
            vals = band[o].reshape(nb, s)      # band[o, g*s + b]
            for a in range(o):
                b = s - o + a
                # row index in band: column g*s+b, need g in 0..nb-2
                E = E.at[:, a, b].set(vals[:-1, b])
    else:
        E = jnp.zeros((0, s, s), dt)
    return D, E


def bt_cholesky(D: jnp.ndarray, E: jnp.ndarray) -> BTFactor:
    """Blocked Cholesky of the block-tridiagonal SPD matrix."""
    nb, s, _ = D.shape

    LD0 = chol_guarded(D[0])

    def step(LD_prev, inp):
        Di, Ei = inp
        # LE_i LD_prev^T = E_i  =>  LE_i = E_i LD_prev^{-T}
        LEi = _solve_L(LD_prev, Ei.T).T
        LDi = chol_guarded(Di - LEi @ LEi.T)
        return LDi, (LDi, LEi)

    if nb == 1:
        return BTFactor(LD0[None], E)
    _, (LDs, LEs) = jax.lax.scan(step, LD0, (D[1:], E))
    LD = jnp.concatenate([LD0[None], LDs], axis=0)
    return BTFactor(LD, LEs)


def bt_half_logdet(fac: BTFactor) -> jnp.ndarray:
    return jnp.sum(jnp.log(jnp.abs(jnp.diagonal(fac.LD, axis1=-2, axis2=-1))))


def bt_solve_L(fac: BTFactor, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L y = b. b: (nb, s) or (nb, s, q)."""
    nb = fac.LD.shape[0]
    vec = b.ndim == 2
    if vec:
        b = b[..., None]

    y0 = _solve_L(fac.LD[0], b[0])

    def step(y_prev, inp):
        LDi, LEi, bi = inp
        yi = _solve_L(LDi, bi - LEi @ y_prev)
        return yi, yi

    if nb > 1:
        _, ys = jax.lax.scan(step, y0, (fac.LD[1:], fac.LE, b[1:]))
        y = jnp.concatenate([y0[None], ys], axis=0)
    else:
        y = y0[None]
    return y[..., 0] if vec else y


def bt_solve_Lt(fac: BTFactor, y: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T x = y. y: (nb, s) or (nb, s, q)."""
    nb = fac.LD.shape[0]
    vec = y.ndim == 2
    if vec:
        y = y[..., None]

    xn = _solve_Lt(fac.LD[-1], y[-1])

    def step(x_next, inp):
        LDi, LEi, yi = inp
        xi = _solve_Lt(LDi, yi - LEi.T @ x_next)
        return xi, xi

    if nb > 1:
        _, xs = jax.lax.scan(
            step, xn, (fac.LD[:-1], fac.LE, y[:-1]), reverse=True)
        x = jnp.concatenate([xs, xn[None]], axis=0)
    else:
        x = xn[None]
    return x[..., 0] if vec else x


def bt_solve(fac: BTFactor, b: jnp.ndarray) -> jnp.ndarray:
    return bt_solve_Lt(fac, bt_solve_L(fac, b))


# ---------------------------------------------------------------------------
# Arrowhead: H = [[Hb (block-tridiag), C], [C^T, Hd]]
# ---------------------------------------------------------------------------

class ArrowFactor(NamedTuple):
    bt: BTFactor      # factor of Hb
    Y: jnp.ndarray    # (nb, s, q) = L^{-1} C
    Ls: jnp.ndarray   # (q, q) lower chol of Schur complement


def arrow_factor(D, E, C, Hd) -> ArrowFactor:
    """Factor the arrowhead matrix. C: (nb, s, q), Hd: (q, q)."""
    fac = bt_cholesky(D, E)
    Y = bt_solve_L(fac, C)                       # (nb, s, q)
    S = Hd - jnp.einsum("nsq,nsr->qr", Y, Y)
    Ls = chol_guarded(S)
    return ArrowFactor(fac, Y, Ls)


def arrow_half_logdet(af: ArrowFactor) -> jnp.ndarray:
    return bt_half_logdet(af.bt) + jnp.sum(jnp.log(jnp.diagonal(af.Ls)))


def arrow_solve(af: ArrowFactor, rb: jnp.ndarray, rd: jnp.ndarray):
    """Solve H [zb; zd] = [rb; rd]. rb: (nb, s), rd: (q,)."""
    u = bt_solve_L(af.bt, rb)                          # (nb, s)
    rhs_d = rd - jnp.einsum("nsq,ns->q", af.Y, u)
    w = _solve_L(af.Ls, rhs_d)
    zd = _solve_Lt(af.Ls, w)
    zb = bt_solve_Lt(af.bt, u - jnp.einsum("nsq,q->ns", af.Y, zd))
    return zb, zd


def arrow_sample(af: ArrowFactor, zb_noise: jnp.ndarray, zd_noise: jnp.ndarray):
    """x = L_full^{-T} z for the arrowhead factor (precision sampling):
    L_full = [[L, 0], [Y^T(in L-basis)..., Ls]] with H = L_full L_full^T.
    zb_noise: (nb, s), zd_noise: (q,). Returns deviations (zb, zd)."""
    xd = _solve_Lt(af.Ls, zd_noise)
    xb = bt_solve_Lt(af.bt, zb_noise - jnp.einsum("nsq,q->ns", af.Y, xd))
    return xb, xd


def arrow_sample_multi(af: ArrowFactor, zb_noise: jnp.ndarray,
                       zd_noise: jnp.ndarray):
    """Multi-RHS precision sampling: zb (nb, s, M), zd (q, M) ->
    deviations of the same shapes, each column ~ N(0, H^{-1})."""
    xd = _solve_Lt(af.Ls, zd_noise)  # (q, M)
    rhs = zb_noise - jnp.einsum("nsq,qM->nsM", af.Y, xd)
    xb = bt_solve_Lt(af.bt, rhs)
    return xb, xd
