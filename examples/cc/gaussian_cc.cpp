/* Shipped C++ driver: 20-D normalised Gaussian through the typed C++ API
 * (the analogue of the reference's src/drivers/polychord_CC.cpp ->
 * likelihoods/CC/CC_likelihood.cpp path, re-expressed over csrc/polychord.hpp).
 *
 * Build + run:  make cc_example
 * Oracle: the Gaussian is normalised and its mass lies inside the unit
 * hypercube, so logZ = 0 within the reported error. */
#include <cmath>
#include <cstdio>

#include "polychord.hpp"

static constexpr int NDIMS = 20;
static constexpr double SIGMA = 0.01;

/* normalised Gaussian centred at 0.5 (reference
 * likelihoods/examples/gaussian.f90:7-10 semantics) */
static double loglikelihood(double *theta, int nDims, double *phi,
                            int nDerived) {
    double r2 = 0.0;
    for (int i = 0; i < nDims; i++) {
        double d = theta[i] - 0.5;
        r2 += d * d;
    }
    if (nDerived > 0) phi[0] = std::sqrt(r2);
    return -r2 / (2 * SIGMA * SIGMA)
           - nDims * std::log(SIGMA * std::sqrt(2 * M_PI));
}

/* unit-hypercube prior */
static void prior(double *cube, double *theta, int nDims) {
    for (int i = 0; i < nDims; i++) theta[i] = cube[i];
}

static void dumper(int ndead, int nlive, int npars, double *live,
                   double *dead, double *logweights, double logZ,
                   double logZerr) {
    (void)nlive; (void)npars; (void)live; (void)dead; (void)logweights;
    std::printf("dumper: ndead=%d logZ=%.4f +/- %.4f\n", ndead, logZ,
                logZerr);
}

int main() {
    Settings settings(NDIMS, 1);

    settings.nlive = 200;
    settings.num_repeats = 2 * NDIMS;
    settings.do_clustering = false;
    settings.read_resume = false;
    settings.write_resume = false;
    settings.base_dir = "chains";
    settings.file_root = "gaussian_cc";
    settings.feedback = 1;
    settings.seed = 17;

    run_polychord(loglikelihood, prior, dumper, settings);
    return 0;
}
