"""4-D Gaussian quickstart (counterpart of the reference ``quickstart.py``):
spherical Gaussian, sigma = 0.1, one derived parameter (r^2), uniform prior
on [-1, 1]^4.  Analytic answer: logZ = -4 log 2 = -2.7726."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

    # Make a posterior plot (reference quickstart.py:62-70; anesthetic when
    # installed, a matplotlib corner fallback otherwise)
    try:
        from anesthetic import make_2d_axes

        fig, ax = make_2d_axes(["p0", "p1", "p2", "p3", "r"])
        output.plot_2d(ax)
        fig.savefig("posterior.pdf")
    except ImportError:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np

        data = np.loadtxt("chains/gaussian_equal_weights.txt")
        theta = data[:, 2 : 2 + nDims]
        fig, axes = plt.subplots(nDims, nDims, figsize=(8, 8))
        for i in range(nDims):
            for j in range(nDims):
                ax = axes[i, j]
                if i == j:
                    ax.hist(theta[:, i], bins=30, density=True)
                elif i > j:
                    ax.plot(theta[:, j], theta[:, i], ".", ms=1, alpha=0.4)
                else:
                    ax.axis("off")
        fig.tight_layout()
        fig.savefig("posterior.png", dpi=120)
        print("wrote posterior.png (install anesthetic for the pdf example)")
