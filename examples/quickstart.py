"""4-D Gaussian quickstart (counterpart of the reference ``quickstart.py``):
spherical Gaussian, sigma = 0.1, one derived parameter (r^2), uniform prior
on [-1, 1]^4.  Analytic answer: logZ = -4 log 2 = -2.7726."""

import jax.numpy as jnp

import polychordlite_tpu
from polychordlite_tpu.priors import UniformPrior

nDims = 4
nDerived = 1
sigma = 0.1


def likelihood(theta):
    """Simple Gaussian likelihood (traceable -> batched on the device)."""
    r2 = jnp.sum(theta**2)
    logL = -jnp.log(2 * jnp.pi * sigma * sigma) * nDims / 2.0 - r2 / 2 / sigma**2
    return logL, [r2]


def prior(hypercube):
    """Uniform prior from [-1,1]^D."""
    return UniformPrior(-1, 1)(hypercube)


def dumper(live, dead, logweights, logZ, logZerr):
    print("Last dead point:", dead[-1])


paramnames = [(f"p{i}", rf"\theta_{i}") for i in range(nDims)] + [("r*", "r")]

if __name__ == "__main__":
    output = polychordlite_tpu.run(
        likelihood,
        nDims,
        nDerived=nDerived,
        prior=prior,
        dumper=dumper,
        file_root="gaussian",
        nlive=200,
        do_clustering=True,
        read_resume=False,
        paramnames=paramnames,
    )
    print(output)
    print("analytic logZ =", -nDims * jnp.log(2.0))
