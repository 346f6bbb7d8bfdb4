"""C++ native kernels vs the NumPy reference implementations."""
import numpy as np
import pytest

from bayesgp_tpu import native
from bayesgp_tpu.basis import osplines, reparam

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_osp_local_poly_matches_numpy():
    rng = np.random.default_rng(0)
    knots = np.unique(np.sort(rng.uniform(0, 5, 12)))
    x = np.sort(rng.uniform(-0.5, 6, 300))
    for p in (1, 2, 3, 4):
        a = native.osp_local_poly(knots, x, p)
        # bypass the native dispatch inside get_local_poly via small size
        kl = knots[:-1][None, :]
        import math
        b = osplines.get_local_poly(knots, x, p) if x.size * (len(knots)-1) <= 200_000 else None
        np.testing.assert_allclose(a, b, atol=1e-13)


def test_banded_gram_and_cross():
    rng = np.random.default_rng(1)
    knots = np.unique(np.linspace(0, 5, 40))
    x = np.sort(rng.uniform(0, 5, 500))
    p = 3
    vals, start = reparam.sparse_rows(x, knots, p)
    d = len(knots) - 1
    w = rng.uniform(0.1, 3.0, len(x))
    B = np.zeros((len(x), d))
    for i in range(len(x)):
        for a in range(p + 1):
            c = start[i] + a
            if c < d:
                B[i, c] = vals[i, a]
    G = (B * w[:, None]).T @ B
    band = native.banded_gram(vals, start, d, w)
    for o in range(p + 1):
        np.testing.assert_allclose(band[o, :d - o], np.diagonal(G, -o),
                                   atol=1e-10)
    X = rng.normal(size=(len(x), 4))
    C = native.banded_cross(vals, start, d, X, w)
    np.testing.assert_allclose(C, (B * w[:, None]).T @ X, atol=1e-10)


def test_banded_symv():
    rng = np.random.default_rng(2)
    d, bw = 30, 3
    band = np.zeros((bw + 1, d))
    for o in range(bw + 1):
        band[o, :d - o] = rng.normal(size=d - o)
    P = np.zeros((d, d))
    for o in range(bw + 1):
        for j in range(d - o):
            P[j + o, j] = band[o, j]
            P[j, j + o] = band[o, j]
    X = rng.normal(size=(d, 5))
    np.testing.assert_allclose(native.banded_symv(band, X), P @ X,
                               atol=1e-12)
    v = rng.normal(size=d)
    np.testing.assert_allclose(native.banded_symv(band, v), P @ v,
                               atol=1e-12)
