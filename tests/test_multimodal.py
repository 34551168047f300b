"""Multimodal oracle: gaussian_shells (two equal modes; reference
``likelihoods/examples/gaussian_shells.f90`` is the canonical clustering
test — local evidences Z/2 each, global Z = 1 over the prior box)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import polychordlite_tpu
from polychordlite_tpu.models import gaussian_shells, twin_gaussian


def box_prior(lo, hi):
    lo = jnp.asarray(lo)
    hi = jnp.asarray(hi)

    def prior(cube):
        return lo + (hi - lo) * cube

    return prior


class TestGaussianShells:
    @pytest.fixture(scope="class")
    def run(self, tmp_path_factory):
        nD = 2
        out = polychordlite_tpu.run(
            gaussian_shells(nD),
            nD,
            prior=box_prior([-6.0, -2.5], [6.0, 2.5]),
            nlive=125,
            num_repeats=10,
            read_resume=False,
            base_dir=str(tmp_path_factory.mktemp("shells")),
            file_root="shells",
            seed=11,
            feedback=0,
            do_clustering=True,
            equals=False,
            posteriors=False,
            write_dead=True,
            write_live=False,
            write_prior=False,
        )
        return out

    def test_logZ_matches_analytic(self, run):
        analytic = -math.log(12.0 * 5.0)  # normalised shells over the box
        assert abs(run.logZ - analytic) < 4 * run.logZerr + 0.1

    def test_two_modes_found(self, run):
        # clusters may over-fragment on the thin rings (the reference's
        # mutual-kNN stability exit does the same) but at least 2 modes must
        # separate
        assert run.ncluster >= 2

    def test_local_evidences_sum_to_global(self, run):
        # sum of local evidences should reproduce the global one
        lzs = np.array(run.logZs)
        total = lzs.max() + np.log(np.sum(np.exp(lzs - lzs.max())))
        assert abs(total - run.logZ) < 0.5


class TestTwinGaussian:
    def test_bimodal_run(self, tmp_path):
        nD = 2
        out = polychordlite_tpu.run(
            twin_gaussian(nD),
            nD,
            nDerived=1,
            prior=box_prior([-1.0, -1.0], [1.0, 1.0]),
            nlive=100,
            num_repeats=8,
            read_resume=False,
            base_dir=str(tmp_path),
            seed=5,
            feedback=0,
            precision_criterion=0.01,
            equals=False,
            posteriors=False,
        )
        # normalised mixture over [-1,1]^2: Z = 1/4 of prior volume norm
        analytic = -2 * math.log(2.0)
        assert abs(out.logZ - analytic) < 4 * out.logZerr + 0.15
