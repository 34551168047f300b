/* Single-core CPU baseline for bench.py.
 *
 * The Fortran reference cannot be built in this image (no gfortran), so this
 * C program re-creates its per-core hot loop at native speed as an honest
 * measured stand-in: whitened slice sampling (Neal 2003 stepping-out +
 * shrinkage, as in PolyChordLite src/polychord/chordal_sampling.f90:163-273)
 * over the 20-D normalised Gaussian example likelihood
 * (likelihoods/examples/gaussian.f90), counting likelihood evaluations per
 * second.  bench.py multiplies by 16 for the "16-rank MPI Fortran" baseline
 * of BASELINE.md.
 *
 * Build: gcc -O3 -march=native -o slice_baseline slice_baseline.c -lm
 * Run:   ./slice_baseline [seconds]
 */

#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <time.h>

#define NDIMS 20
#define SIGMA 0.1
#define MU 0.5

/* xorshift128+ — fast PRNG comparable to the reference's intrinsic RNG */
static uint64_t rng_s[2] = {0x123456789abcdefULL, 0xfedcba987654321ULL};
static inline uint64_t xorshift128p(void) {
    uint64_t x = rng_s[0];
    uint64_t const y = rng_s[1];
    rng_s[0] = y;
    x ^= x << 23;
    rng_s[1] = x ^ y ^ (x >> 17) ^ (y >> 26);
    return rng_s[1] + y;
}
static inline double urand(void) {
    return (double)(xorshift128p() >> 11) * (1.0 / 9007199254740992.0);
}
static inline double grand(void) { /* Box-Muller */
    double u1 = urand() + 1e-300, u2 = urand();
    return sqrt(-2.0 * log(u1)) * cos(2.0 * M_PI * u2);
}

static long nlike = 0;

static double loglike(const double *t) {
    double s2 = 0.0;
    for (int i = 0; i < NDIMS; i++) {
        double d = (t[i] - MU) / SIGMA;
        s2 += d * d;
    }
    nlike++;
    return -0.5 * s2 - NDIMS * (log(SIGMA) + 0.5 * log(2.0 * M_PI));
}

/* one slice-sample step along nhat from x0, contour logL0; returns new point
 * in x0 (chordal_sampling.f90:163-273 semantics with cube walls omitted —
 * generous to the baseline) */
static void slice_sample(double *x0, const double *nhat, double w, double logL0) {
    double u = urand();
    double tL = -u * w, tR = (1.0 - u) * w;
    double probe[NDIMS];
    int i;

    for (;;) { /* expand R */
        for (i = 0; i < NDIMS; i++) probe[i] = x0[i] + tR * nhat[i];
        if (loglike(probe) < logL0) break;
        tR += w;
        if (tR > 100 * w) break;
    }
    for (;;) { /* expand L */
        for (i = 0; i < NDIMS; i++) probe[i] = x0[i] + tL * nhat[i];
        if (loglike(probe) < logL0) break;
        tL -= w;
        if (tL < -100 * w) break;
    }
    for (int k = 0; k < 100; k++) { /* shrink */
        double t = tL + urand() * (tR - tL);
        for (i = 0; i < NDIMS; i++) probe[i] = x0[i] + t * nhat[i];
        if (loglike(probe) >= logL0) {
            for (i = 0; i < NDIMS; i++) x0[i] = probe[i];
            return;
        }
        if (t > 0) tR = t; else tL = t;
    }
}

int main(int argc, char **argv) {
    double seconds = argc > 1 ? atof(argv[1]) : 2.0;
    double x0[NDIMS], nhat[NDIMS];
    for (int i = 0; i < NDIMS; i++) x0[i] = MU;

    /* a contour enclosing ~the typical set, like a mid-run NS contour */
    double r0 = 0.15;
    double logL0 = -0.5 * (r0 / SIGMA) * (r0 / SIGMA) * NDIMS
                   - NDIMS * (log(SIGMA) + 0.5 * log(2.0 * M_PI));
    double w = 3.0 * SIGMA; /* whitened width, as the reference sets it */

    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);
    double elapsed = 0.0;
    while (elapsed < seconds) {
        for (int rep = 0; rep < 200; rep++) {
            double norm = 0.0;
            for (int i = 0; i < NDIMS; i++) { nhat[i] = grand(); norm += nhat[i] * nhat[i]; }
            norm = sqrt(norm);
            for (int i = 0; i < NDIMS; i++) nhat[i] /= norm;
            slice_sample(x0, nhat, w, logL0);
        }
        clock_gettime(CLOCK_MONOTONIC, &t1);
        elapsed = (t1.tv_sec - t0.tv_sec) + 1e-9 * (t1.tv_nsec - t0.tv_nsec);
    }
    printf("%.0f\n", (double)nlike / elapsed);
    return 0;
}
