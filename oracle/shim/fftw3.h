// Minimal FFTW3 r2r stand-in for the parity oracle build (no FFTW dev
// headers in this image). Implements exactly the subset the reference uses
// (OpticalFlowCurvature.cpp:52-55,144-167): 2D REDFT10/REDFT01 plans on
// row-major double arrays, executed naively in O(n^2) per axis — plenty for
// oracle-sized test images, and bit-accurate to the FFTW definitions:
//   REDFT10: Y[k] = 2 * sum_n X[n] cos(pi (n+1/2) k / N)
//   REDFT01: Y[k] = X[0] + 2 * sum_{n>=1} X[n] cos(pi n (k+1/2) / N)
#pragma once

#include <cmath>
#include <cstdlib>
#include <cstring>
#include <vector>

typedef enum {
    FFTW_REDFT10 = 5,
    FFTW_REDFT01 = 4,
} fftw_r2r_kind;

#define FFTW_MEASURE 0U
#define FFTW_ESTIMATE 64U

struct fftw_plan_s {
    int n0, n1;
    fftw_r2r_kind k0, k1;
};
typedef fftw_plan_s* fftw_plan;

static inline fftw_plan fftw_plan_r2r_2d(int n0, int n1, double* /*in*/,
                                         double* /*out*/, fftw_r2r_kind k0,
                                         fftw_r2r_kind k1, unsigned /*flags*/) {
    fftw_plan p = new fftw_plan_s;
    p->n0 = n0;
    p->n1 = n1;
    p->k0 = k0;
    p->k1 = k1;
    return p;
}

static inline void fftw_shim_dct_1d(const double* x, double* y, int n, int stride,
                                    fftw_r2r_kind kind) {
    const double pi = 3.14159265358979323846;
    if (kind == FFTW_REDFT10) {
        for (int k = 0; k < n; k++) {
            double acc = 0.0;
            for (int j = 0; j < n; j++) {
                acc += x[j * stride] * std::cos(pi * (j + 0.5) * k / n);
            }
            y[k] = 2.0 * acc;
        }
    } else {  // FFTW_REDFT01
        for (int k = 0; k < n; k++) {
            double acc = x[0];
            for (int j = 1; j < n; j++) {
                acc += 2.0 * x[j * stride] * std::cos(pi * j * (k + 0.5) / n);
            }
            y[k] = acc;
        }
    }
}

static inline void fftw_execute_r2r(const fftw_plan p, double* in, double* out) {
    const int n0 = p->n0, n1 = p->n1;
    std::vector<double> tmp((size_t)n0 * n1);
    std::vector<double> line(std::max(n0, n1));
    // Transform along dim 1 (contiguous rows) first.
    for (int i = 0; i < n0; i++) {
        fftw_shim_dct_1d(in + (size_t)i * n1, line.data(), n1, 1, p->k1);
        std::memcpy(tmp.data() + (size_t)i * n1, line.data(), n1 * sizeof(double));
    }
    // Then along dim 0 (stride n1 columns).
    for (int j = 0; j < n1; j++) {
        fftw_shim_dct_1d(tmp.data() + j, line.data(), n0, n1, p->k0);
        for (int i = 0; i < n0; i++) {
            out[(size_t)i * n1 + j] = line[i];
        }
    }
}

static inline void fftw_destroy_plan(fftw_plan p) { delete p; }
