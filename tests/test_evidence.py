"""Evidence-recurrence oracle tests (SURVEY §7 step 2): the update_evidence
recurrences must reproduce the closed-form first and second moments of the
nested-sampling shrinkage distribution, and cluster splitting must conserve
all evidence bookkeeping."""

import math

import numpy as np
import pytest

from polychordlite_tpu.core import rti as rti_mod
from polychordlite_tpu.core.rti import (
    RunTimeInfo,
    add_cluster,
    calculate_logZ_estimate,
    delete_cluster,
    delete_outermost_point,
    find_min_loglikelihoods,
    live_logZ,
    replace_point,
    update_evidence,
)
from polychordlite_tpu.settings import PolyChordSettings


def make_settings(nDims=2, nlive=5, **kw):
    s = PolyChordSettings(nDims, 0, nlive=nlive, num_repeats=2 * nDims, **kw)
    return s.finalise()


def make_rti(settings, live_logLs):
    """RTI with one cluster holding points at given loglikelihoods."""
    rti = RunTimeInfo(settings, n_grades=1)
    n = len(live_logLs)
    pts = np.zeros((n, settings.nTotal))
    pts[:, settings.h] = np.random.default_rng(0).uniform(size=(n, settings.nDims))
    pts[:, settings.p] = pts[:, settings.h]
    pts[:, settings.b0] = settings.logzero
    pts[:, settings.l0] = live_logLs
    rti.live[0] = pts
    find_min_loglikelihoods(rti)
    return rti


def closed_form_moments(logLs, n):
    """Closed-form E[Z] and E[Z^2] for deleting points with likelihoods
    L_1..L_k from a constant-n live set, with X_i = prod of i Beta(n,1)
    shrinkages and w_i = X_{i-1} - X_i:
        E[X_i X_j] = (n/(n+2))^min * (n/(n+1))^|i-j|
    """
    L = np.exp(np.asarray(logLs, dtype=np.float64))
    k = len(L)
    r1 = n / (n + 1.0)
    r2 = n / (n + 2.0)

    EX = r1 ** np.arange(k + 1)  # E[X_i]
    Ez = float(np.sum(L * (EX[:-1] - EX[1:])))

    def EXX(i, j):
        lo, hi = min(i, j), max(i, j)
        return r2**lo * r1 ** (hi - lo)

    Ez2 = 0.0
    for i in range(1, k + 1):
        for j in range(1, k + 1):
            Eww = (
                EXX(i - 1, j - 1)
                - EXX(i - 1, j)
                - EXX(i, j - 1)
                + EXX(i, j)
            )
            Ez2 += L[i - 1] * L[j - 1] * Eww
    return Ez, Ez2


class TestUpdateEvidence:
    def test_first_and_second_moments_match_closed_form(self):
        n = 12  # actual live-point count (kept constant by re-filling)
        s = make_settings(nlive=n)
        logLs_sorted = np.sort(np.random.default_rng(1).normal(0.0, 1.0, n))
        rti = make_rti(s, logLs_sorted)
        deleted = []
        # delete all the way down, replacing each deleted point by a higher
        # dummy so nlive stays constant (constant-n shrinkage)
        for step in range(12):
            p = 0
            deleted.append(float(rti.logLp[p]))
            update_evidence(rti, p)
            idx = int(rti.i[p])
            rti.live[p] = np.delete(rti.live[p], idx, axis=0)
            filler = np.zeros(s.nTotal)
            filler[s.l0] = 1e10 + step  # always above everything
            rti.live[p] = np.vstack([rti.live[p], filler])
            find_min_loglikelihoods(rti)

        Ez, Ez2 = closed_form_moments(deleted, n)
        assert np.isclose(math.exp(rti.logZ), Ez, rtol=1e-10)
        assert np.isclose(math.exp(rti.logZ2), Ez2, rtol=1e-10)
        # single cluster: local must equal global
        assert np.isclose(rti.logZp[0], rti.logZ)
        assert np.isclose(rti.logZp2[0], rti.logZ2)

    def test_volume_contraction(self):
        n = 7
        s = make_settings(nlive=n)
        rti = make_rti(s, np.linspace(-3, 0, n))
        for _ in range(4):
            update_evidence(rti, 0)
        assert np.isclose(rti.logXp[0], 4 * math.log(n / (n + 1.0)))
        # <X^2> after k deletions = (n/(n+2))^k
        assert np.isclose(rti.logXpXq[0, 0], 4 * math.log(n / (n + 2.0)))

    def test_logweight_output(self):
        n = 4
        s = make_settings(nlive=n)
        rti = make_rti(s, np.linspace(-1, 0, n))
        lw = update_evidence(rti, 0)
        assert np.isclose(lw, -math.log(n + 1.0))  # X=1 initially

    def test_logZ_estimate_unbiasing(self):
        s = make_settings(nlive=5)
        rti = make_rti(s, np.linspace(-2, 0, 5))
        for _ in range(10):
            update_evidence(rti, 0)
            idx = int(rti.i[0])
            rti.live[0][idx, s.l0] = 1e5  # push back up
            find_min_loglikelihoods(rti)
        logZ, var, logZp, varp, _, _ = calculate_logZ_estimate(rti)
        assert np.isclose(logZ, 2 * rti.logZ - 0.5 * rti.logZ2)
        assert np.isclose(var, rti.logZ2 - 2 * rti.logZ)
        assert var > 0


class TestClusterSplit:
    def _split(self, n1=6, n2=4, pre_deletions=3):
        n = n1 + n2
        s = make_settings(nlive=n)
        rti = make_rti(s, np.linspace(-5, -1, n))
        for _ in range(pre_deletions):  # accumulate some evidence first
            update_evidence(rti, 0)
            idx = int(rti.i[0])
            rti.live[0][idx, s.l0] += 10.0
            find_min_loglikelihoods(rti)
        before = dict(
            logZ=rti.logZ,
            logZ2=rti.logZ2,
            logXp=rti.logXp.copy(),
            logXpXq=rti.logXpXq.copy(),
            logZp=rti.logZp.copy(),
            logZXp=rti.logZXp.copy(),
        )
        labels = np.array([0] * n1 + [1] * n2)
        add_cluster(rti, 0, labels, 2)
        return s, rti, before

    def test_split_partitions_live_points(self):
        s, rti, _ = self._split()
        assert rti.ncluster == 2
        assert rti.live[0].shape[0] == 6
        assert rti.live[1].shape[0] == 4

    def test_split_conserves_volume_and_evidence(self):
        import polychordlite_tpu.ops.logspace as lsp

        s, rti, before = self._split()
        # sum <X_i> = <X_p>
        assert np.isclose(lsp.logsumexp(np, rti.logXp), before["logXp"][0])
        # sum <Z_i> = <Z_p>; global untouched
        assert np.isclose(lsp.logsumexp(np, rti.logZp), before["logZp"][0])
        assert rti.logZ == before["logZ"]
        assert rti.logZ2 == before["logZ2"]
        # sum_ij <X_i X_j> = <X_p^2>
        assert np.isclose(
            lsp.logsumexp(np, rti.logXpXq.ravel()), before["logXpXq"][0, 0]
        )
        # sum <Z X_i> = <Z X_p>
        assert np.isclose(lsp.logsumexp(np, rti.logZXp), before["logZXp"][0])

    def test_split_proportional_to_counts(self):
        s, rti, before = self._split()
        assert np.isclose(
            rti.logXp[0] - rti.logXp[1], math.log(6.0 / 4.0)
        )

    def test_delete_cluster_retires_empty(self):
        s, rti, _ = self._split()
        rti.live[1] = np.zeros((0, s.nTotal))
        find_min_loglikelihoods(rti)
        assert delete_cluster(rti)
        assert rti.ncluster == 1
        assert rti.ncluster_dead == 1
        assert len(rti.logZp_dead) == 1
        assert not delete_cluster(rti)

    def test_update_evidence_cross_terms_multicluster(self):
        """After a split, deleting from one cluster must contract the OTHER
        cluster's cross-correlations too (run_time_info.f90:266-294)."""
        s, rti, _ = self._split()
        X01_before = rti.logXpXq[0, 1]
        n0 = rti.live[0].shape[0]
        update_evidence(rti, 0)
        assert np.isclose(
            rti.logXpXq[0, 1] - X01_before, math.log(n0 / (n0 + 1.0))
        )
        assert np.isclose(rti.logXpXq[0, 1], rti.logXpXq[1, 0])


class TestReplacePoint:
    def _baby(self, s, logL, cube=None):
        b = np.zeros(s.nTotal)
        b[s.h] = 0.5 if cube is None else cube
        b[s.p] = b[s.h]
        b[s.b0] = -10.0
        b[s.l0] = logL
        return b

    def test_accept_above_contour(self):
        s = make_settings(nlive=5)
        rti = make_rti(s, np.linspace(-5, -1, 5))
        babies = np.stack([self._baby(s, -4.5), self._baby(s, -0.5)])
        ndead0 = rti.ndead
        ok = replace_point(rti, babies, 0)
        assert ok
        assert rti.ndead == ndead0 + 1  # outermost deleted
        assert rti.live[0].shape[0] == 5
        assert len(rti.phantom[0]) == 1  # first baby became a phantom
        # contour has risen
        assert rti.logLp[0] > -5

    def test_reject_below_contour(self):
        s = make_settings(nlive=5)
        rti = make_rti(s, np.linspace(-5, -1, 5))
        babies = np.stack([self._baby(s, -9.0), self._baby(s, -8.0)])
        ok = replace_point(rti, babies, 0)
        assert not ok
        # dead-on-arrival zero-weight record (run_time_info.f90:781-785)
        assert rti.ndead == 1
        assert rti.logweights[-1] == s.logzero
        assert rti.live[0].shape[0] == 5

    def test_variable_nlive_schedule_shrinks(self):
        s = make_settings(nlive=5, nlives={-2.0: 3})
        rti = make_rti(s, np.linspace(-5, -1, 5))
        # contour at -5 -> target nlive 5; delete a couple until contour > -2
        for logL in [-4.5, -0.5, -0.4, -0.3, -0.2, -0.1]:
            babies = np.stack([self._baby(s, logL)] * 2)
            replace_point(rti, babies, 0)
        # once contour passes -2.0 the target drops to 3: live count shrinks
        assert rti.total_nlive() <= 4

    def test_live_logZ_single_cluster(self):
        s = make_settings(nlive=4)
        logLs = np.array([-1.0, -2.0, -3.0, -4.0])
        rti = make_rti(s, logLs)
        expect = math.log(np.exp(logLs).mean())  # X=1
        assert np.isclose(live_logZ(rti), expect)
