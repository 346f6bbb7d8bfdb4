"""Cubic B-spline basis evaluation matching fda::create.bspline.basis /
fda::eval.basis (used by the reference's sGP machinery at
R/01_utility.R:71-83, 178-189).

fda's basis with `rangeval=c(lo,hi), nbasis=k, norder=4` places
`k - norder + 2` equally spaced breakpoints over [lo, hi]; `dropind=c(1,2)`
removes the first two basis functions (boundary handling). Evaluation at the
right endpoint uses the left-limit polynomial piece, which scipy reproduces
with `extrapolate=True`.
"""
from __future__ import annotations

import numpy as np
from scipy.interpolate import BSpline


def bspline_knots(lo: float, hi: float, nbasis: int, norder: int = 4) -> np.ndarray:
    """Full (clamped) knot vector for fda's equally-spaced break sequence."""
    nbreaks = nbasis - norder + 2
    if nbreaks < 2:
        raise ValueError("nbasis too small for norder")
    breaks = np.linspace(lo, hi, nbreaks)
    return np.concatenate([
        np.full(norder - 1, lo), breaks, np.full(norder - 1, hi)])


def eval_bspline_basis(x, lo: float, hi: float, nbasis: int, norder: int = 4,
                       deriv: int = 0, dropind=()) -> np.ndarray:
    """(len(x), nbasis - len(dropind)) design matrix of the basis (or its
    `deriv`-th derivative). `dropind` is 1-based like fda's."""
    x = np.asarray(x, dtype=np.float64)
    t = bspline_knots(lo, hi, nbasis, norder)
    spl = BSpline(t, np.eye(nbasis), norder - 1, extrapolate=True)
    if deriv > 0:
        spl = spl.derivative(deriv)
    out = spl(x)
    if dropind:
        keep = [i for i in range(nbasis) if (i + 1) not in set(dropind)]
        out = out[:, keep]
    return np.asarray(out, dtype=np.float64)
