"""Blocked float64 Cholesky / triangular solves for TPU.

XLA's float64 `cholesky` and `solve_triangular` on TPU lower to
sequential scalar-ish loops (~8 ms for a 128x128 factor — 100x the
arithmetic cost), while float64 MATMULS emulate efficiently on the MXU.
These kernels restructure the factorization into matmuls + small
unrolled base cases: recursive 2x2 blocking down to a 16-wide
column-unrolled base. Used by linalg.block_tridiag when running float64
on TPU; exact same values as the LAPACK-style primitives.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

BASE = 16


def _chol_base(A):
    """Unrolled Cholesky-Banachiewicz for a (b, b) block, b = static."""
    b = A.shape[0]
    L = jnp.zeros_like(A)
    for j in range(b):
        # s = A[j:, j] - L[j:, :j] @ L[j, :j]
        s = A[:, j] - L @ L[j, :]
        djj = jnp.sqrt(s[j])
        col = s / djj
        mask = jnp.arange(b) >= j
        L = L.at[:, j].set(jnp.where(mask, col, 0.0))
    return L


def _trsm_right_lt_base(B, L):
    """X L^T = B for lower-triangular (b, b) L, B (m, b): column forward
    substitution, unrolled over the static block width."""
    b = L.shape[0]
    X = jnp.zeros_like(B)
    for j in range(b):
        # X[:, j] = (B[:, j] - X[:, :j] @ L[j, :j]) / L[j, j]
        acc = B[:, j] - X @ L[j, :]
        X = X.at[:, j].set(acc / L[j, j])
    return X


def _trsm_left_base(L, B):
    """L X = B for lower-triangular (b, b) L, B (b, m)."""
    b = L.shape[0]
    X = jnp.zeros_like(B)
    for i in range(b):
        acc = B[i] - L[i, :] @ X
        X = X.at[i].set(acc / L[i, i])
    return X


def _trsm_left_t_base(L, B):
    """L^T X = B for lower-triangular (b, b) L, B (b, m)."""
    b = L.shape[0]
    X = jnp.zeros_like(B)
    for i in reversed(range(b)):
        acc = B[i] - L[:, i] @ X
        X = X.at[i].set(acc / L[i, i])
    return X


def cholesky_blocked(A):
    """Lower Cholesky of a (s, s) SPD matrix, s a power-of-2 multiple of
    BASE (or <= BASE)."""
    s = A.shape[0]
    if s <= BASE:
        return _chol_base(A)
    h = s // 2
    A11, A21, A22 = A[:h, :h], A[h:, :h], A[h:, h:]
    L11 = cholesky_blocked(A11)
    L21 = _trsm_right_lt(A21, L11)
    S = A22 - L21 @ L21.T
    L22 = cholesky_blocked(S)
    top = jnp.concatenate([L11, jnp.zeros((h, s - h), A.dtype)], axis=1)
    bot = jnp.concatenate([L21, L22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _trsm_right_lt(B, L):
    """X L^T = B, L (b, b) lower, B (m, b) — blocked."""
    b = L.shape[0]
    if b <= BASE:
        return _trsm_right_lt_base(B, L)
    h = b // 2
    L11, L21, L22 = L[:h, :h], L[h:, :h], L[h:, h:]
    X1 = _trsm_right_lt(B[:, :h], L11)
    X2 = _trsm_right_lt(B[:, h:] - X1 @ L21.T, L22)
    return jnp.concatenate([X1, X2], axis=1)


def trsm_left_lower(L, B):
    """Solve L X = B (L lower (s, s), B (s, m) or (s,)) — blocked."""
    vec = B.ndim == 1
    if vec:
        B = B[:, None]
    s = L.shape[0]

    def rec(L, B):
        b = L.shape[0]
        if b <= BASE:
            return _trsm_left_base(L, B)
        h = b // 2
        X1 = rec(L[:h, :h], B[:h])
        X2 = rec(L[h:, h:], B[h:] - L[h:, :h] @ X1)
        return jnp.concatenate([X1, X2], axis=0)

    X = rec(L, B)
    return X[:, 0] if vec else X


def trsm_left_lower_t(L, B):
    """Solve L^T X = B (L lower (s, s), B (s, m) or (s,)) — blocked."""
    vec = B.ndim == 1
    if vec:
        B = B[:, None]

    def rec(L, B):
        b = L.shape[0]
        if b <= BASE:
            return _trsm_left_t_base(L, B)
        h = b // 2
        X2 = rec(L[h:, h:], B[h:])
        X1 = rec(L[:h, :h], B[:h] - L[h:, :h].T @ X2)
        return jnp.concatenate([X1, X2], axis=0)

    X = rec(L, B)
    return X[:, 0] if vec else X


def use_blocked(dtype) -> bool:
    """Currently disabled: on the axon TPU backend the blocked-matmul
    formulation measures the SAME ~9 ms per 128-block as XLA's native
    f64 cholesky/solve_triangular — the cost is sequential depth times
    per-op f64-emulation latency, not the algorithm. These kernels are
    the scaffolding for a round-2 double-float (two-f32) Pallas
    factorization, which removes the f64 emulation from the inner loop
    entirely."""
    return False
