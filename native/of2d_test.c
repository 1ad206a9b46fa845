/* Smoke test for the native C API: registers a synthetic translated pair
 * through libopticalflow2d.so and checks the SSD drops. Exit 0 on success. */

#include <math.h>
#include <stdio.h>
#include <stdlib.h>

extern int of2d_init(int dimx, int dimy, const int* niter, int nscales,
                     int reg, const double* regparams, int nparams,
                     int nrefine, int verbose);
extern int of2d_register_images(const double* iref, const double* imov);
extern int of2d_get_motion(double* out);
extern int of2d_warp(const double* img, double* out);
extern int of2d_close(void);
extern const char* of2d_last_error(void);

#define NX 48
#define NY 40

static double blob(double x, double y, double cx, double cy, double s) {
    return exp(-((x - cx) * (x - cx) + (y - cy) * (y - cy)) / (2 * s * s));
}

static void fill(double* img, double ox, double oy) {
    for (int j = 0; j < NY; j++) {
        for (int i = 0; i < NX; i++) {
            double x = i - ox, y = j - oy;
            img[i + j * NX] = blob(x, y, NX * 0.4, NY * 0.5, 6.0) +
                              0.7 * blob(x, y, NX * 0.65, NY * 0.3, 4.0);
        }
    }
}

int main(void) {
    double *iref = malloc(NX * NY * sizeof(double));
    double *imov = malloc(NX * NY * sizeof(double));
    double *ireg = malloc(NX * NY * sizeof(double));
    double *motion = malloc(2 * NX * NY * sizeof(double));
    fill(iref, 0.0, 0.0);
    fill(imov, 1.5, -0.8);

    int niter[2] = {40, 20};
    double params[2] = {0.25, 0.0};
    if (of2d_init(NX, NY, niter, 1, 5, params, 2, 1, 0) != 0) {
        fprintf(stderr, "init failed: %s\n", of2d_last_error());
        return 1;
    }
    if (of2d_register_images(iref, imov) != 0) {
        fprintf(stderr, "register failed: %s\n", of2d_last_error());
        return 1;
    }
    if (of2d_get_motion(motion) != 0) {
        fprintf(stderr, "get_motion failed: %s\n", of2d_last_error());
        return 1;
    }
    if (of2d_warp(imov, ireg) != 0) {
        fprintf(stderr, "warp failed: %s\n", of2d_last_error());
        return 1;
    }

    double ssd0 = 0, ssd1 = 0, maxu = 0;
    for (int k = 0; k < NX * NY; k++) {
        double d0 = iref[k] - imov[k], d1 = iref[k] - ireg[k];
        ssd0 += d0 * d0;
        ssd1 += d1 * d1;
    }
    for (int k = 0; k < 2 * NX * NY; k++) {
        if (fabs(motion[k]) > maxu) maxu = fabs(motion[k]);
    }
    printf("C API: ssd %.4f -> %.4f, maxabs(u) = %.3f\n", ssd0, ssd1, maxu);

    if (of2d_close() != 0) {
        fprintf(stderr, "close failed: %s\n", of2d_last_error());
        return 1;
    }
    if (!(ssd1 < 0.5 * ssd0) || !(maxu > 0.1)) {
        fprintf(stderr, "registration quality check failed\n");
        return 2;
    }
    printf("C API smoke test PASSED\n");
    return 0;
}
