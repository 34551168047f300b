"""Legacy Fortran-text resume codec: synthetic multi-cluster round-trip and
reading a pypolychord-forged minimal resume (the de-facto cross-format test
of the reference, SURVEY §4)."""

import numpy as np
import pytest

from polychordlite_tpu.core.rti import (
    RowStore,
    RunTimeInfo,
    add_cluster,
    find_min_loglikelihoods,
    replace_point,
    update_evidence,
)
from polychordlite_tpu.settings import PolyChordSettings
from polychordlite_tpu.utils.legacy_resume import (
    read_legacy_resume,
    write_legacy_resume,
)


def midrun_state():
    s = PolyChordSettings(2, 0, nlive=10, num_repeats=4).finalise()
    rti = RunTimeInfo(s, 1)
    rng = np.random.default_rng(0)
    pts = np.zeros((10, s.nTotal))
    pts[:, s.h] = rng.uniform(size=(10, 2))
    pts[:, s.p] = pts[:, s.h] * 2 - 1
    pts[:, s.b0] = s.logzero
    pts[:, s.l0] = np.sort(rng.normal(size=10))
    rti.live[0] = pts
    rti.num_repeats = np.array([4])
    find_min_loglikelihoods(rti)
    for _ in range(5):  # accumulate evidence + dead points
        baby = np.zeros((2, s.nTotal))
        baby[:, s.h] = rng.uniform(size=(2, 2))
        baby[:, s.l0] = rti.live[0][:, s.l0].max() + rng.uniform(size=2)
        baby[:, s.b0] = rti.logLp[0]
        replace_point(rti, baby, 0)
    add_cluster(rti, 0, np.array([0] * 6 + [1] * 4), 2)
    return s, rti


class TestLegacyRoundTrip:
    def test_full_state_round_trip(self, tmp_path):
        s, rti = midrun_state()
        path = str(tmp_path / "t.resume")
        write_legacy_resume(path, s, rti)
        rti2 = read_legacy_resume(path, s, 1)

        assert rti2.ncluster == rti.ncluster == 2
        assert rti2.ndead == rti.ndead
        assert np.isclose(rti2.logZ, rti.logZ)
        assert np.isclose(rti2.logZ2, rti.logZ2)
        assert np.allclose(rti2.logXp, rti.logXp)
        assert np.allclose(rti2.logXpXq, rti.logXpXq)
        assert np.allclose(rti2.logZXp, rti.logZXp)
        assert np.allclose(rti2.maxlogweight, rti.maxlogweight)
        for a, b in zip(rti2.live, rti.live):
            assert np.allclose(a, b)
        for a, b in zip(rti2.phantom, rti.phantom):
            assert np.allclose(a.data, b.data)
        assert np.allclose(rti2.dead_array(), rti.dead_array())
        assert np.allclose(rti2.logweights, rti.logweights)
        assert np.allclose(rti2.cholesky, rti.cholesky)
        assert np.array_equal(rti2.i, rti.i)
        assert np.isclose(rti2.maxlogweight_global, rti.maxlogweight_global)

    def test_dimension_mismatch_rejected(self, tmp_path):
        s, rti = midrun_state()
        path = str(tmp_path / "t.resume")
        write_legacy_resume(path, s, rti)
        s2 = PolyChordSettings(3, 0, nlive=10, num_repeats=4).finalise()
        with pytest.raises(ValueError):
            read_legacy_resume(path, s2, 1)

    def test_grade_mismatch_rejected(self, tmp_path):
        s, rti = midrun_state()
        path = str(tmp_path / "t.resume")
        write_legacy_resume(path, s, rti)
        s3 = PolyChordSettings(2, 0, nlive=10, num_repeats=4)
        s3.grade_dims = [1, 1]
        s3.finalise()
        with pytest.raises(ValueError):
            read_legacy_resume(path, s3, 2)


class TestForgedResume:
    def test_read_pypolychord_forged_file(self, tmp_path):
        """Read a minimal file in the shape pypolychord's _make_resume_file
        forges for cube_samples (polychord.py:650-789)."""
        s = PolyChordSettings(2, 0, nlive=4, num_repeats=4).finalise()
        lives = np.array(
            [
                [0.1, 0.2, 0.1, 0.2, -1e30, -3.0],
                [0.5, 0.6, 0.5, 0.6, -1e30, -1.0],
            ]
        )
        rows = []

        def w(var, fmt):
            rows.append("".join(fmt % v for v in np.atleast_1d(var)))

        rows.append("=== Number of dimensions ===")
        w(2, "%12d")
        rows.append("=== Number of derived parameters ===")
        w(0, "%12d")
        rows.append("=== Number of dead points/iterations ===")
        w(0, "%12d")
        rows.append("=== Number of clusters ===")
        w(1, "%12d")
        rows.append("=== Number of dead clusters ===")
        w(0, "%12d")
        rows.append("=== Number of global weighted posterior points ===")
        w(0, "%12d")
        rows.append("=== Number of global equally weighted posterior points ===")
        w(0, "%12d")
        rows.append("=== Number of grades ===")
        w(1, "%12d")
        rows.append("=== positions of grades ===")
        w(2, "%12d")
        rows.append("=== Number of repeats ===")
        w(4, "%12d")
        rows.append("=== Number of likelihood calls ===")
        w(2, "%12d")
        rows.append("=== Number of live points in each cluster ===")
        w(2, "%12d")
        rows.append("=== Number of phantom points in each cluster ===")
        w(0, "%12d")
        rows.append("=== Number of weighted posterior points in each cluster ===")
        w(0, "%12d")
        rows.append("=== Number of equally weighted posterior points in each cluster ===")
        w(0, "%12d")
        rows.append("=== Minimum loglikelihood positions ===")
        w(1, "%12d")
        rows.append("=== Number of weighted posterior points in each dead cluster ===")
        rows.append("=== Number of equally weighted posterior points in each dead cluster ===")
        rows.append("=== global evidence -- log(<Z>) ===")
        w(-1e30, "%24.15E")
        rows.append("=== global evidence^2 -- log(<Z^2>) ===")
        w(-1e30, "%24.15E")
        rows.append("=== posterior thin factor ===")
        w(0.0, "%24.15E")
        rows.append("=== local loglikelihood bounds ===")
        w(-3.0, "%24.15E")
        rows.append("=== local volume -- log(<X_p>) ===")
        w(0.0, "%24.15E")
        rows.append("=== last update volume ===")
        w(0.0, "%24.15E")
        rows.append("=== global evidence volume cross correlation -- log(<ZX_p>) ===")
        w(-1e30, "%24.15E")
        rows.append("=== local evidence -- log(<Z_p>) ===")
        w(-1e30, "%24.15E")
        rows.append("=== local evidence^2 -- log(<Z_p^2>) ===")
        w(-1e30, "%24.15E")
        rows.append("=== local evidence volume cross correlation -- log(<Z_pX_p>) ===")
        w(-1e30, "%24.15E")
        rows.append("=== local volume cross correlation -- log(<X_pX_q>) ===")
        w(0.0, "%24.15E")
        rows.append("=== maximum log weights -- log(w_p) ===")
        w(-1e30, "%24.15E")
        rows.append("=== local dead evidence -- log(<Z_p>) ===")
        rows.append("=== local dead evidence^2 -- log(<Z_p^2>) ===")
        rows.append("=== maximum dead log weights -- log(w_p) ===")
        rows.append("=== covariance matrices ===")
        rows.append("---------------------------------------")
        for x in np.identity(2):
            w(x, "%24.15E")
        rows.append("=== cholesky decompositions ===")
        rows.append("---------------------------------------")
        for x in np.identity(2):
            w(x, "%24.15E")
        rows.append("=== live points ===")
        rows.append("---------------------------------------")
        for x in lives:
            w(x, "%24.15E")
        rows.append("=== dead points ===")
        rows.append("=== logweights of dead points ===")
        rows.append("=== phantom points ===")
        rows.append("---------------------------------------")
        rows.append("=== weighted posterior points ===")
        rows.append("---------------------------------------")
        rows.append("=== dead weighted posterior points ===")
        rows.append("=== global weighted posterior points ===")
        rows.append("=== equally weighted posterior points ===")
        rows.append("---------------------------------------")
        rows.append("=== dead equally weighted posterior points ===")
        rows.append("=== global equally weighted posterior points ===")

        path = str(tmp_path / "forged.resume")
        with open(path, "w") as f:
            f.write("\n".join(rows) + "\n")

        rti = read_legacy_resume(path, s, 1)
        assert rti.ncluster == 1
        assert rti.live[0].shape == (2, s.nTotal)
        assert np.allclose(rti.live[0], lives)
        assert rti.logZ == -1e30
        assert np.allclose(rti.cholesky[0], np.eye(2))
