// bayesgp_native — C++ host-side model-construction kernels.
//
// The reference's native layer is the TMB C++ objective plus the Eigen/
// CHOLMOD runtime it instantiates (src/BayesGP.cpp; SURVEY.md section
// 2.2). In this framework the device compute path is JAX/XLA; the native
// layer instead accelerates the host-side GRAPH BUILD: O-spline design
// evaluation, banded Gram assembly from sparse design rows, and banded
// symmetric matrix application. Exposed with a C ABI for ctypes.
//
// Build: make -C native          (produces libbayesgp_native.so)

#include <cmath>
#include <cstdint>
#include <algorithm>

extern "C" {

// O-spline local design (reference semantics: R/01_utility.R:346-364).
// knots: nk ascending (first is the origin); x: nx eval points;
// out: (nx, nk-1) row-major.
void osp_local_poly(const double* knots, int64_t nk,
                    const double* x, int64_t nx,
                    int64_t p, double* out) {
    const int64_t m = nk - 1;
    // factorials up to p
    double fact[64];
    fact[0] = 1.0;
    for (int64_t i = 1; i <= p; ++i) fact[i] = fact[i - 1] * (double)i;

    #pragma omp parallel for schedule(static)
    for (int64_t j = 0; j < nx; ++j) {
        const double xj = x[j];
        double* row = out + j * m;
        for (int64_t i = 0; i < m; ++i) {
            const double kl = knots[i], kr = knots[i + 1];
            if (xj <= kl) {
                row[i] = 0.0;
            } else if (xj <= kr) {
                double v = 1.0;
                const double dx = xj - kl;
                for (int64_t t = 0; t < p; ++t) v *= dx;
                row[i] = v / fact[p];
            } else {
                // polynomial continuation: sum_{q=1..p}
                //   dif^q (x - kr)^{p-q} / (q! (p-q)!)
                const double dif = kr - kl;
                const double dx = xj - kr;
                double acc = 0.0;
                double difq = 1.0;
                for (int64_t q = 1; q <= p; ++q) {
                    difq *= dif;
                    double dxp = 1.0;
                    for (int64_t t = 0; t < p - q; ++t) dxp *= dx;
                    acc += difq * dxp / (fact[q] * fact[p - q]);
                }
                row[i] = acc;
            }
        }
    }
}

// Banded Gram assembly from sparse design rows:
//   band[o * d + g] = sum over rows i, offsets (a, b) with a - b = o and
//   start[i] + b = g of w[i] * vals[i, a] * vals[i, b]
// vals: (n, nnz) row-major; start: (n,); w: (n,) (pass ones for B'B).
// band_out: (bw+1, d) row-major, bw = nnz - 1. Zero-initialized by caller.
void banded_gram(const double* vals, const int64_t* start,
                 int64_t n, int64_t nnz, int64_t d,
                 const double* w, double* band_out) {
    const int64_t bw = nnz - 1;
    for (int64_t i = 0; i < n; ++i) {
        const double wi = w[i];
        const double* vi = vals + i * nnz;
        const int64_t s = start[i];
        for (int64_t b = 0; b < nnz; ++b) {
            const int64_t g = s + b;
            if (g < 0 || g >= d) continue;
            const double vb = wi * vi[b];
            for (int64_t a = b; a < nnz; ++a) {
                const int64_t o = a - b;
                band_out[o * d + g] += vb * vi[a];
            }
        }
    }
}

// Cross product B' diag(w) X from sparse rows:
//   out[(start[i]+a) * q + c] += w[i] * vals[i, a] * X[i, c]
void banded_cross(const double* vals, const int64_t* start,
                  int64_t n, int64_t nnz, int64_t d,
                  const double* X, int64_t q,
                  const double* w, double* out) {
    for (int64_t i = 0; i < n; ++i) {
        const double wi = w[i];
        const double* vi = vals + i * nnz;
        const double* xi = X + i * q;
        const int64_t s = start[i];
        for (int64_t a = 0; a < nnz; ++a) {
            const int64_t g = s + a;
            if (g < 0 || g >= d) continue;
            const double va = wi * vi[a];
            double* og = out + g * q;
            for (int64_t c = 0; c < q; ++c) og[c] += va * xi[c];
        }
    }
}

// Symmetric banded matrix-vector products: Y = P @ X for X (d, q),
// band: (bw+1, d) lower storage band[o*d + j] = P[j+o, j].
void banded_symv(const double* band, int64_t bw, int64_t d,
                 const double* X, int64_t q, double* out) {
    for (int64_t j = 0; j < d; ++j)
        for (int64_t c = 0; c < q; ++c)
            out[j * q + c] = band[j] * X[j * q + c];
    for (int64_t o = 1; o <= bw; ++o) {
        const double* bo = band + o * d;
        for (int64_t j = 0; j + o < d; ++j) {
            const double v = bo[j];
            if (v == 0.0) continue;
            for (int64_t c = 0; c < q; ++c) {
                out[(j + o) * q + c] += v * X[j * q + c];
                out[j * q + c] += v * X[(j + o) * q + c];
            }
        }
    }
}

}  // extern "C"
